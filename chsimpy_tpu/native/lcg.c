/* Bit-exact float64 MATLAB-style LCG sampler.
 *
 * The reference generator (chsimpy/mport.py:8-32) iterates
 *     x = fmod(a*x + c, m)
 * in IEEE double precision (a*x overflows 2^53, so the rounding of the
 * double multiply IS part of the sequence definition).  The recurrence is
 * inherently sequential (16.7M iterations at N=4096), so it lives in C;
 * the Python fallback in rng.py produces identical bits.
 *
 * MUST be compiled with -ffp-contract=off: an FMA contraction of a*x + c
 * would change the rounding and break the golden vector
 * (tests/test_lcg.py, reference tests/test.py:25-37).
 */
#include <math.h>
#include <stdint.h>

void lcg_fill_colmajor(double *out, int64_t n1, int64_t n2, double seed) {
    const double a = 1103515245.0;
    const double c = 12345.0;
    const double m = 2147483648.0; /* 2^31 */
    double x = seed;
    int64_t total = n1 * n2;
    /* column-major fill like MATLAB: element i goes to (i % n1, i / n1) */
    for (int64_t i = 0; i < total; ++i) {
        x = fmod(a * x + c, m);
        out[(i % n1) * n2 + (i / n1)] = x;
    }
    /* divide (not multiply-by-reciprocal): rounding must match numpy's
       `sample /= (m - 1)` */
    for (int64_t i = 0; i < total; ++i) {
        out[i] /= (m - 1.0);
    }
}
