/* Independent C pin of the full LISA outputs on the Guerry fixture.
 *
 * Reads the vendored fixture (src/test/resources/guerry.tsv — 85 French
 * departments, Crm_prs column; src/test/resources/guerry_queen_expected.txt
 * — the reference's OWN expected queen neighbor map from
 * postgeoda/test/test_weights_queen.sql:140), then computes, in plain C
 * with no code shared with the Scala engine:
 *
 *   local_moran, local_g, local_gstar, local_geary
 *
 * each as (stat, pseudo-p, cluster) per observation with the reference's
 * fully-specified 'complete' conditional-permutation scheme
 * (postgeoda/src/proxy.cpp:339-458): ThomasWangHashDouble, per-row seed
 * stream seed+idx, round-half-away candidate, reject self/duplicates,
 * two-sided fold, p=(count+1)/(perms+1). 999 permutations, seed
 * 123456789, cutoff 0.05. Standardization = mean / SAMPLE sd (moran,
 * geary); the G family runs on raw values. Cluster rules as documented
 * in LisaKernels.scala (moran quadrants; G, G-star and Geary split on
 * the empirical permutation mean).
 *
 * Build + run (from repo root):
 *   gcc -O2 -o /tmp/pin_guerry tools/pin_guerry_lisa.c -lm
 *   /tmp/pin_guerry > src/test/resources/guerry_lisa_expected.tsv
 *
 * The committed TSV is asserted row-exactly by GuerrySpec. This is an
 * independent reimplementation of the documented reference algorithm —
 * the strongest external pin available offline (libgeoda itself is an
 * un-vendored submodule in /root/reference and cannot be compiled here).
 */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <math.h>
#include <string.h>

#define N_OBS 85
#define PERMS 999
#define SEED 123456789
#define CUTOFF 0.05

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

/* draw n_draw distinct ids != self from [0, num_obs-1]; returns new seed */
static int draw_distinct(int seed_start, int num_obs, int self, int n_draw,
                         set_t *work, int *out) {
    int max_rand = num_obs - 1;
    int got = 0;
    while (got < n_draw) {
        double rng = thomas_wang_hash_double((uint64_t)(int64_t)seed_start) * max_rand;
        seed_start++;
        int cand = (int)(rng < 0.0 ? ceil(rng - 0.5) : floor(rng + 0.5));
        if (cand != self && !set_belongs(work, cand)) {
            set_push(work, cand);
            got++;
        }
    }
    set_drain(work, out);
    return seed_start;
}

/* generic conditional permutation: returns p, sets *perm_mean.
 * stat_of(ids, m, ctx) computes the permuted statistic. */
typedef double (*stat_fn)(const int *ids, int m, int idx, const double *v,
                          double aux);
static double permutation_p(int idx, int n_nbrs, int num_obs, double observed,
                            stat_fn f, const double *v, double aux,
                            set_t *work, int *drawn, double *perm_mean) {
    int seed_start = SEED + idx;
    uint64_t count_larger = 0;
    double sum = 0.0;
    for (int perm = 0; perm < PERMS; perm++) {
        seed_start = draw_distinct(seed_start, num_obs, idx, n_nbrs, work, drawn);
        double s = f(drawn, n_nbrs, idx, v, aux);
        sum += s;
        if (s >= observed) count_larger++;
    }
    *perm_mean = sum / PERMS;
    if (PERMS - count_larger <= count_larger)
        count_larger = PERMS - count_larger;
    return (count_larger + 1.0) / (PERMS + 1.0);
}

static double stat_moran(const int *ids, int m, int idx, const double *z,
                         double aux) {
    (void)aux;
    double lag = 0;
    for (int i = 0; i < m; i++) lag += z[ids[i]];
    lag /= m;
    return z[idx] * lag;
}
static double stat_g(const int *ids, int m, int idx, const double *x,
                     double denom) {
    (void)idx;
    double s = 0;
    for (int i = 0; i < m; i++) s += x[ids[i]];
    return s / denom;
}
static double stat_gstar(const int *ids, int m, int idx, const double *x,
                         double sum_all) {
    double s = 0;
    for (int i = 0; i < m; i++) s += x[ids[i]];
    return (s + x[idx]) / sum_all;
}
static double stat_geary(const int *ids, int m, int idx, const double *z,
                         double aux) {
    (void)aux;
    double s = 0;
    for (int i = 0; i < m; i++) { double d = z[idx] - z[ids[i]]; s += d * d; }
    return s / m;
}
/* multivariate Geary: average of per-variable local Geary over the
 * standardized variables (engine kernel LisaKernels.multiGeary; second
 * variable passed via file-static to fit the stat_fn shape). FP order
 * matches the kernel: per-variable accumulation, then sv/m terms summed,
 * then / nv. */
static const double *mg_z2;
static double stat_mgeary(const int *ids, int m, int idx, const double *z,
                          double aux) {
    (void)aux;
    double s1 = 0, s2 = 0;
    for (int i = 0; i < m; i++) {
        double d1 = z[idx] - z[ids[i]]; s1 += d1 * d1;
        double d2 = mg_z2[idx] - mg_z2[ids[i]]; s2 += d2 * d2;
    }
    return (s1 / m + s2 / m) / 2.0;
}

/* bivariate Moran: z_x(idx) (aux) times the mean of the drawn side's
 * z_y (array) — LisaKernels.biMoran's statOfDrawn shape */
static double stat_bimoran(const int *ids, int m, int idx, const double *zy,
                           double zxi) {
    (void)idx;
    double lag = 0;
    for (int i = 0; i < m; i++) lag += zy[ids[i]];
    lag /= m;
    return zxi * lag;
}

/* join count family: xi (aux) times the sum of the DRAWN side's variable */
static double stat_jc(const int *ids, int m, int idx, const double *x,
                      double xi) {
    (void)idx;
    double s = 0;
    for (int i = 0; i < m; i++) s += x[ids[i]];
    return xi * s;
}

/* 'lookup' permutation mode (the reference's own default, proxy.cpp:315,
 * as specified in LisaKernels.LookupTable): ONE shared PERMS x maxK
 * table of distinct draws in [0, N-2] (self never in the reduced
 * domain), consumed per row with the self-skip shift cand>=idx ? cand+1
 * : cand. Same ThomasWang stream, same two-sided fold. */
static int *build_lookup(int num_obs, int maxk) {
    int *t = malloc((size_t)PERMS * maxk * sizeof(int));
    set_t work; set_init(&work, num_obs);
    int *tmp = malloc(maxk * sizeof(int));
    int seed_start = SEED;
    for (int p = 0; p < PERMS; p++) {
        seed_start = draw_distinct(seed_start, num_obs - 1, -1, maxk,
                                   &work, tmp);
        memcpy(t + (size_t)p * maxk, tmp, maxk * sizeof(int));
    }
    free(tmp); free(work.flags); free(work.stack);
    return t;
}
static double lookup_p(int idx, int n_nbrs, const int *table, int maxk,
                       double observed, stat_fn f, const double *v,
                       double aux, int *drawn, double *perm_mean) {
    uint64_t count_larger = 0;
    double sum = 0.0;
    for (int p = 0; p < PERMS; p++) {
        const int *base = table + (size_t)p * maxk;
        for (int j = 0; j < n_nbrs; j++) {
            int cand = base[j];
            drawn[j] = cand >= idx ? cand + 1 : cand;
        }
        double s = f(drawn, n_nbrs, idx, v, aux);
        sum += s;
        if (s >= observed) count_larger++;
    }
    *perm_mean = sum / PERMS;
    if (PERMS - count_larger <= count_larger)
        count_larger = PERMS - count_larger;
    return (count_larger + 1.0) / (PERMS + 1.0);
}

/* GeoDa percentile (plotting positions p_i = 100*(i+0.5)/n, linear
 * interpolation, clamped) — FP-order identical to Stat0.percentileSorted */
static int cmp_dbl(const void *a, const void *b) {
    double x = *(const double *)a, y = *(const double *)b;
    return x < y ? -1 : x > y ? 1 : 0;
}
static double percentile_sorted(double x, const double *s, int n) {
    double nd = (double)n;
    double p0 = (100.0 / nd) * 0.5;
    double pN = (100.0 / nd) * (nd - 0.5);
    if (x <= p0) return s[0];
    if (x >= pN) return s[n - 1];
    double idx = x * nd / 100.0 - 0.5;
    int i = (int)floor(idx);
    double frac = idx - i;
    if (i >= n - 1) return s[n - 1];
    return s[i] + frac * (s[i + 1] - s[i]);
}
/* quantile-bin indicator: breaks at 100*i/k (i=1..k-1), bin = 1 +
 * #{breaks <= x}, indicator = (bin == q) — Lisa.quantileIndicator */
static void quantile_indicator(const double *v, int n, int k, int q,
                               double *out) {
    double *sorted = malloc(n * sizeof(double));
    memcpy(sorted, v, n * sizeof(double));
    qsort(sorted, n, sizeof(double), cmp_dbl);
    double breaks[16];
    for (int i = 1; i < k; i++)
        breaks[i - 1] = percentile_sorted(100.0 * i / k, sorted, n);
    for (int j = 0; j < n; j++) {
        int bin = 1;
        for (int b = 0; b < k - 1 && v[j] >= breaks[b]; b++) bin++;
        out[j] = bin == q ? 1.0 : 0.0;
    }
    free(sorted);
}

static void standardize(double *x, int n) {
    double m = 0, s2 = 0;
    for (int i = 0; i < n; i++) m += x[i];
    m /= n;
    for (int i = 0; i < n; i++) { double d = x[i] - m; s2 += d * d; }
    double sd = sqrt(s2 / (n - 1));
    for (int i = 0; i < n; i++) x[i] = sd == 0 ? x[i] - m : (x[i] - m) / sd;
}

int main(void) {
    /* ---- parse guerry.tsv (crm_prs + litercy) ---- */
    double raw[N_OBS], lit[N_OBS];
    {
        FILE *f = fopen("src/test/resources/guerry.tsv", "r");
        if (!f) { fprintf(stderr, "missing guerry.tsv (run from repo root)\n"); return 1; }
        char *line = NULL; size_t cap = 0;
        if (getline(&line, &cap, f) < 0) return 1; /* header */
        int n = 0;
        while (getline(&line, &cap, f) >= 0 && n < N_OBS) {
            char *tok = strtok(line, "\t");     /* ogc_fid */
            tok = strtok(NULL, "\t");           /* wkb */
            tok = strtok(NULL, "\t");           /* crm_prs */
            raw[n] = atof(tok);
            tok = strtok(NULL, "\t");           /* crm_prp */
            tok = strtok(NULL, "\t\n");         /* litercy */
            lit[n] = atof(tok);
            n++;
        }
        fclose(f); free(line);
        if (n != N_OBS) { fprintf(stderr, "expected 85 rows, got %d\n", n); return 1; }
    }

    /* ---- parse queen map: [gid:{nbr:w,...},...] ---- */
    int *nbrs[N_OBS]; int n_nbrs[N_OBS];
    {
        FILE *f = fopen("src/test/resources/guerry_queen_expected.txt", "r");
        if (!f) { fprintf(stderr, "missing queen map\n"); return 1; }
        fseek(f, 0, SEEK_END); long sz = ftell(f); fseek(f, 0, SEEK_SET);
        char *buf = malloc(sz + 1);
        if (fread(buf, 1, sz, f) != (size_t)sz) return 1;
        buf[sz] = 0; fclose(f);
        const char *p = buf;
        for (int g = 0; g < N_OBS; g++) { nbrs[g] = NULL; n_nbrs[g] = 0; }
        while (*p) {
            while (*p && (*p < '0' || *p > '9')) p++;
            if (!*p) break;
            int gid = (int)strtol(p, (char **)&p, 10);
            if (*p != ':') continue;
            p++; if (*p != '{') continue;
            p++;
            int tmp[32], cnt = 0;
            while (*p && *p != '}') {
                int nb = (int)strtol(p, (char **)&p, 10);
                if (*p == ':') { strtol(p + 1, (char **)&p, 10); } /* weight */
                tmp[cnt++] = nb;
                if (*p == ',') p++;
            }
            if (*p == '}') p++;
            /* ascending, matching the engine's sort_array(nbrs) — the
             * observed-lag FP sum order must agree for exact equality */
            for (int a = 1; a < cnt; a++) {
                int v = tmp[a], b = a - 1;
                while (b >= 0 && tmp[b] > v) { tmp[b + 1] = tmp[b]; b--; }
                tmp[b + 1] = v;
            }
            nbrs[gid] = malloc(cnt * sizeof(int));
            memcpy(nbrs[gid], tmp, cnt * sizeof(int));
            n_nbrs[gid] = cnt;
        }
        free(buf);
    }

    /* ---- values ---- */
    double z[N_OBS];                      /* standardized (moran, geary) */
    memcpy(z, raw, sizeof(z));
    standardize(z, N_OBS);
    double z2[N_OBS];                     /* standardized litercy (mgeary) */
    memcpy(z2, lit, sizeof(z2));
    standardize(z2, N_OBS);
    mg_z2 = z2;
    double sum_all = 0;                   /* raw sum (G family) */
    for (int i = 0; i < N_OBS; i++) sum_all += raw[i];

    /* binary indicators for the join-count family: x1 = crm_prs > 20000
     * (37 ones), x2 = 1 - x1 (no colocation, the bijoincount
     * precondition), x3 = litercy > 38 (41 ones); mprod = x1*x3 */
    double x1[N_OBS], x2[N_OBS], mprod[N_OBS];
    for (int i = 0; i < N_OBS; i++) {
        x1[i] = raw[i] > 20000.0 ? 1.0 : 0.0;
        x2[i] = 1.0 - x1[i];
        mprod[i] = x1[i] * (lit[i] > 38.0 ? 1.0 : 0.0);
    }
    /* quantile LISA indicator: top quintile of crm_prs (k=5, q=5) */
    double ql_x[N_OBS];
    quantile_indicator(raw, N_OBS, 5, 5, ql_x);
    /* multiquantile: above-median crm_prs AND below-median litercy
     * (k=2,q=2 x k=2,q=1 — 23 ones, adjacency-rich on the queen map) */
    double qa[N_OBS], qb[N_OBS], mq_x[N_OBS];
    quantile_indicator(raw, N_OBS, 2, 2, qa);
    quantile_indicator(lit, N_OBS, 2, 1, qb);
    for (int i = 0; i < N_OBS; i++) mq_x[i] = qa[i] * qb[i];

    set_t work; set_init(&work, N_OBS);
    int drawn[64];
    /* lookup-mode shared table sized by the global max degree */
    int maxk = 0;
    for (int i = 0; i < N_OBS; i++) if (n_nbrs[i] > maxk) maxk = n_nbrs[i];
    int *lk_table = build_lookup(N_OBS, maxk);

    printf("gid\tmoran_i\tmoran_p\tmoran_c\tg\tg_p\tg_c\tgstar\tgstar_p\tgstar_c\tgeary\tgeary_p\tgeary_c\tjc\tjc_p\tbjc\tbjc_p\tmjc\tmjc_p\tnn\tmg\tmg_p\tmg_c\tql\tql_p\tmq\tmq_p\tmo_lkp\tmo_lkc\tg_lkp\tg_lkc\tgs_lkp\tgs_lkc\tge_lkp\tge_lkc\tjc_lkp\tbjc_lkp\tmjc_lkp\tql_lkp\tmq_lkp\tmg_lkp\tmg_lkc\tbm\tbm_p\tbm_c\tbm_lkp\tbm_lkc\n");
    for (int i = 0; i < N_OBS; i++) {
        int m = n_nbrs[i];
        double pm;
        /* moran */
        double lag = 0;
        for (int j = 0; j < m; j++) lag += z[nbrs[i][j]];
        lag /= m;
        double mo = z[i] * lag;
        double mp = permutation_p(i, m, N_OBS, mo, stat_moran, z, 0, &work,
                                  drawn, &pm);
        int mc = mp > CUTOFF ? 0
               : (z[i] > 0 && lag > 0) ? 1
               : (z[i] < 0 && lag < 0) ? 2
               : (z[i] < 0 && lag > 0) ? 3
               : (z[i] > 0 && lag < 0) ? 4 : 0;
        /* local G */
        double denom = sum_all - raw[i];
        double gobs = stat_g(nbrs[i], m, i, raw, denom);
        double gp = permutation_p(i, m, N_OBS, gobs, stat_g, raw, denom,
                                  &work, drawn, &pm);
        int gc = gp > CUTOFF ? 0 : (gobs > pm ? 1 : 2);
        /* G* */
        double gsobs = stat_gstar(nbrs[i], m, i, raw, sum_all);
        double gsp = permutation_p(i, m, N_OBS, gsobs, stat_gstar, raw,
                                   sum_all, &work, drawn, &pm);
        int gsc = gsp > CUTOFF ? 0 : (gsobs > pm ? 1 : 2);
        /* geary */
        double geobs = stat_geary(nbrs[i], m, i, z, 0);
        double gep = permutation_p(i, m, N_OBS, geobs, stat_geary, z, 0,
                                   &work, drawn, &pm);
        int gec = gep > CUTOFF ? 0
                : (geobs > pm) ? 4
                : (z[i] > 0 && lag > 0) ? 1
                : (z[i] < 0 && lag < 0) ? 2 : 3;
        /* join count family: p only defined where the home indicator is
         * 1 AND the observed count is nonzero (else p = -1), third slot
         * = neighbor count — LisaKernels.joinCount semantics from
         * proxy_joincount.cpp:25-61 */
        double jc[5], st[5];
        const double *side1[5] = { x1, x1, mprod, ql_x, mq_x };
        const double *side2[5] = { x1, x2, mprod, ql_x, mq_x };
        for (int s = 0; s < 5; s++) {
            double xi = side1[s][i];
            double obs = stat_jc(nbrs[i], m, i, side2[s], xi);
            st[s] = obs;
            if (xi != 1.0 || obs == 0.0) jc[s] = -1.0;
            else jc[s] = permutation_p(i, m, N_OBS, obs, stat_jc, side2[s],
                                       xi, &work, drawn, &pm);
        }
        /* moran with the 'lookup' permutation mode: same statistic,
         * p from the shared table, same quadrant cluster rule */
        double lk_pm;
        double mo_lkp = lookup_p(i, m, lk_table, maxk, mo, stat_moran, z, 0,
                                 drawn, &lk_pm);
        int mo_lkc = mo_lkp > CUTOFF ? 0
                   : (z[i] > 0 && lag > 0) ? 1
                   : (z[i] < 0 && lag < 0) ? 2
                   : (z[i] < 0 && lag > 0) ? 3
                   : (z[i] > 0 && lag < 0) ? 4 : 0;
        /* lookup-mode G / G* / Geary (same shared table; G-family
         * cluster split on the lookup permutation mean) */
        double g_lkp = lookup_p(i, m, lk_table, maxk, gobs, stat_g, raw,
                                denom, drawn, &lk_pm);
        int g_lkc = g_lkp > CUTOFF ? 0 : (gobs > lk_pm ? 1 : 2);
        double gs_lkp = lookup_p(i, m, lk_table, maxk, gsobs, stat_gstar,
                                 raw, sum_all, drawn, &lk_pm);
        int gs_lkc = gs_lkp > CUTOFF ? 0 : (gsobs > lk_pm ? 1 : 2);
        double ge_lkp = lookup_p(i, m, lk_table, maxk, geobs, stat_geary,
                                 z, 0, drawn, &lk_pm);
        int ge_lkc = ge_lkp > CUTOFF ? 0
                   : (geobs > lk_pm) ? 4
                   : (z[i] > 0 && lag > 0) ? 1
                   : (z[i] < 0 && lag < 0) ? 2 : 3;
        /* multivariate Geary (crm_prs + litercy standardized); cluster =
         * significance flag (LisaKernels.multiGeary) */
        double mgobs = stat_mgeary(nbrs[i], m, i, z, 0);
        double mgp = permutation_p(i, m, N_OBS, mgobs, stat_mgeary, z, 0,
                                   &work, drawn, &pm);
        int mgc = mgp <= CUTOFF ? 1 : 0;
        /* lookup-mode join-count family: same shared table, p only
         * defined where the home indicator is 1 and the observed count
         * is nonzero (else -1), same as the 'complete' columns */
        double jclk[5];
        for (int s = 0; s < 5; s++) {
            double xi = side1[s][i];
            if (xi != 1.0 || st[s] == 0.0) jclk[s] = -1.0;
            else jclk[s] = lookup_p(i, m, lk_table, maxk, st[s], stat_jc,
                                    side2[s], xi, drawn, &lk_pm);
        }
        /* lookup-mode multivariate Geary */
        double mg_lkp = lookup_p(i, m, lk_table, maxk, mgobs, stat_mgeary,
                                 z, 0, drawn, &lk_pm);
        int mg_lkc = mg_lkp <= CUTOFF ? 1 : 0;
        /* bivariate Moran (crm_prs x litercy, LisaKernels.biMoran):
         * z_x(i) fixed, conditional permutation over z_y; quadrant
         * cluster rule on (z_x(i), observed lag of z_y) */
        double blag = 0;
        for (int j = 0; j < m; j++) blag += z2[nbrs[i][j]];
        blag /= m;
        double bmobs = z[i] * blag;
        double bmp = permutation_p(i, m, N_OBS, bmobs, stat_bimoran, z2,
                                   z[i], &work, drawn, &pm);
        int bmc = bmp > CUTOFF ? 0
                : (z[i] > 0 && blag > 0) ? 1
                : (z[i] < 0 && blag < 0) ? 2
                : (z[i] < 0 && blag > 0) ? 3
                : (z[i] > 0 && blag < 0) ? 4 : 0;
        double bm_lkp = lookup_p(i, m, lk_table, maxk, bmobs, stat_bimoran,
                                 z2, z[i], drawn, &lk_pm);
        int bm_lkc = bm_lkp > CUTOFF ? 0
                : (z[i] > 0 && blag > 0) ? 1
                : (z[i] < 0 && blag < 0) ? 2
                : (z[i] < 0 && blag > 0) ? 3
                : (z[i] > 0 && blag < 0) ? 4 : 0;
        printf("%d\t%.17g\t%.17g\t%d\t%.17g\t%.17g\t%d\t%.17g\t%.17g\t%d\t%.17g\t%.17g\t%d\t%.17g\t%.17g\t%.17g\t%.17g\t%.17g\t%.17g\t%d\t%.17g\t%.17g\t%d\t%.17g\t%.17g\t%.17g\t%.17g\t%.17g\t%d\t%.17g\t%d\t%.17g\t%d\t%.17g\t%d\t%.17g\t%.17g\t%.17g\t%.17g\t%.17g\t%.17g\t%d\t%.17g\t%.17g\t%d\t%.17g\t%d\n",
               i, mo, mp, mc, gobs, gp, gc, gsobs, gsp, gsc, geobs, gep, gec,
               st[0], jc[0], st[1], jc[1], st[2], jc[2], m, mgobs, mgp, mgc,
               st[3], jc[3], st[4], jc[4], mo_lkp, mo_lkc,
               g_lkp, g_lkc, gs_lkp, gs_lkc, ge_lkp, ge_lkc,
               jclk[0], jclk[1], jclk[2], jclk[3], jclk[4], mg_lkp, mg_lkc,
               bmobs, bmp, bmc, bm_lkp, bm_lkc);
    }
    return 0;
}
