#pragma once
/* empty stub: the kernel only uses <R.h> symbols from here */
