#pragma once
/* empty stub: the kernel does not use SEXP inside LibHLA.cpp */
