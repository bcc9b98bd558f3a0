#pragma once
/* Route the kernel's PARALLEL_FOR macros to the system TBB (same backend
 * RcppParallel uses). */
#define RCPP_PARALLEL_USE_TBB 1
#include <tbb/blocked_range.h>
#include <tbb/task_arena.h>
