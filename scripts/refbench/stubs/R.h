/* Minimal R-API stub so the reference HIBAG kernel (LibHLA.cpp and its
 * SIMD target files, compiled directly from /root/reference/src — never
 * copied) links into a standalone benchmark driver. Only the symbols the
 * kernel actually touches are provided: RNG, printing, error, interrupt.
 */
#pragma once
#include <cstdarg>
#include <cstdio>
#include <cstdlib>
#include <cfloat>
#include <climits>
#include <cmath>
#include <stdexcept>

#define NA_INTEGER INT_MIN

extern "C" {
double unif_rand(void);
void stub_set_seed(unsigned int seed);
}

#ifndef TRUE
#define TRUE 1
#endif
#ifndef FALSE
#define FALSE 0
#endif
typedef int Rboolean;

#define R_FINITE(x) (std::isfinite(x))

inline void Rprintf(const char *fmt, ...)
{
    va_list ap;
    va_start(ap, fmt);
    vfprintf(stderr, fmt, ap);
    va_end(ap);
}

[[noreturn]] inline void Rf_error_impl(const char *fmt, va_list ap)
{
    char buf[4096];
    vsnprintf(buf, sizeof(buf), fmt, ap);
    fprintf(stderr, "Rf_error: %s\n", buf);
    abort();
}

[[noreturn]] inline void Rf_error(const char *fmt, ...)
{
    va_list ap;
    va_start(ap, fmt);
    Rf_error_impl(fmt, ap);
}

inline void R_CheckUserInterrupt(void) {}

inline Rboolean R_ToplevelExec(void (*fn)(void *), void *data)
{
    fn(data);
    return TRUE;
}
