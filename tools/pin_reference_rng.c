/* Reproducible pin harness for the C-pinned values in
 * src/test/scala/graft/core/RngSpec.scala and
 * src/test/scala/graft/stats/LisaKernelsSpec.scala.
 *
 * Reimplements, in plain C, the reference's conditional-permutation
 * scheme exactly as specified by cuulee/postgeoda
 * `postgeoda/src/proxy.cpp:339-458` ('complete' method):
 *   - ThomasWangHashDouble 64-bit mix mapped to [0,1),
 *   - per-row seed stream seed + idx, one hash per attempt,
 *   - candidate = round-half-away-from-zero(hash * (num_obs-1)),
 *   - reject self and duplicates (GeoDaSet semantics),
 *   - two-sided fold count = min(count, perms-count), p = (count+1)/(perms+1),
 *   - values standardized by mean / SAMPLE standard deviation.
 *
 * Build + run:   gcc -O2 -o /tmp/pin_rng tools/pin_reference_rng.c -lm
 *                /tmp/pin_rng
 * Output: the hash values pinned in RngSpec, then stat/p per node for the
 * path-graph toy (99 perms) and the 10-ring toy (999 perms) pinned in
 * LisaKernelsSpec — compare by eye or diff against the spec constants.
 */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <math.h>
#include <string.h>

static double thomas_wang_hash_double(uint64_t key) {
    key = (~key) + (key << 21);
    key = key ^ (key >> 24);
    key = (key + (key << 3)) + (key << 8);
    key = key ^ (key >> 14);
    key = (key + (key << 2)) + (key << 4);
    key = key ^ (key >> 28);
    key = key + (key << 31);
    return 5.42101086242752217E-20 * key;
}

/* GeoDaSet: O(1) membership + insertion-ordered drain */
typedef struct { int *flags; int *stack; int top; } set_t;
static void set_init(set_t *s, int cap) {
    s->flags = calloc(cap, sizeof(int));
    s->stack = malloc(cap * sizeof(int));
    s->top = 0;
}
static int set_belongs(set_t *s, int v) { return s->flags[v]; }
static void set_push(set_t *s, int v) {
    if (!s->flags[v]) { s->stack[s->top++] = v; s->flags[v] = 1; }
}
static int set_drain(set_t *s, int *out) {
    int n = s->top;
    for (int i = 0; i < n; i++) { out[i] = s->stack[i]; s->flags[s->stack[i]] = 0; }
    s->top = 0;
    return n;
}

static void standardize(double *x, int n) {
    double m = 0, s2 = 0;
    for (int i = 0; i < n; i++) m += x[i];
    m /= n;
    for (int i = 0; i < n; i++) { double d = x[i] - m; s2 += d * d; }
    double sd = sqrt(s2 / (n - 1));
    for (int i = 0; i < n; i++) x[i] = sd == 0 ? x[i] - m : (x[i] - m) / sd;
}

/* one observation's local moran + pseudo p (the proxy.cpp loop verbatim) */
static void moran_row(int idx, const int *nbrs, int n_nbrs,
                      const double *z, int num_obs,
                      int permutations, int seed,
                      double *stat, double *p) {
    double lag = 0;
    for (int i = 0; i < n_nbrs; i++) lag += z[nbrs[i]];
    lag /= n_nbrs;
    double obs = z[idx] * lag;
    set_t work; set_init(&work, num_obs);
    int *drawn = malloc(n_nbrs * sizeof(int));
    int seed_start = seed + idx;
    int max_rand = num_obs - 1;
    uint64_t count_larger = 0;
    for (int perm = 0; perm < permutations; perm++) {
        int got = 0;
        while (got < n_nbrs) {
            double rng = thomas_wang_hash_double((uint64_t)(int64_t)seed_start) * max_rand;
            seed_start++;
            int cand = (int)(rng < 0.0 ? ceil(rng - 0.5) : floor(rng + 0.5));
            if (cand != idx && !set_belongs(&work, cand)) {
                set_push(&work, cand);
                got++;
            }
        }
        set_drain(&work, drawn);
        double plag = 0;
        for (int i = 0; i < n_nbrs; i++) plag += z[drawn[i]];
        plag /= n_nbrs;
        if (plag * z[idx] >= obs) count_larger++;
    }
    if (permutations - count_larger <= count_larger)
        count_larger = permutations - count_larger;
    *stat = obs;
    *p = (count_larger + 1.0) / (permutations + 1.0);
    free(drawn); free(work.flags); free(work.stack);
}

int main(void) {
    /* RngSpec pins: raw hash values */
    printf("hash(0)   = %.17g\n", thomas_wang_hash_double(0));
    printf("hash(1)   = %.17g\n", thomas_wang_hash_double(1));
    printf("hash(123456789) = %.17g\n", thomas_wang_hash_double(123456789));
    printf("hash(-1 as i64) = %.17g\n",
           thomas_wang_hash_double((uint64_t)(int64_t)(-1)));

    /* path-graph toy: z = [-1, 0, 1], 99 perms, seed 123456789 */
    {
        double z[3] = {-1.0, 0.0, 1.0};
        int nb0[] = {1}, nb1[] = {0, 2}, nb2[] = {1};
        double s, p;
        moran_row(0, nb0, 1, z, 3, 99, 123456789, &s, &p);
        printf("path[0] I=%.17g p=%.17g\n", s, p);
        moran_row(1, nb1, 2, z, 3, 99, 123456789, &s, &p);
        printf("path[1] I=%.17g p=%.17g\n", s, p);
        moran_row(2, nb2, 1, z, 3, 99, 123456789, &s, &p);
        printf("path[2] I=%.17g p=%.17g\n", s, p);
    }

    /* 10-ring toy: v = 0..9 standardized, 999 perms, seed 123456789 */
    {
        double v[10];
        for (int i = 0; i < 10; i++) v[i] = (double)i;
        standardize(v, 10);
        for (int i = 0; i < 10; i++) {
            int nb[2] = {(i + 9) % 10, (i + 1) % 10};
            double s, p;
            moran_row(i, nb, 2, v, 10, 999, 123456789, &s, &p);
            printf("ring[%d] I=%.17g p=%.17g\n", i, s, p);
        }
    }
    return 0;
}
