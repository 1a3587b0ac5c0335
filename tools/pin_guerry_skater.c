/* Independent C pin of SKATER / REDCAP cluster assignments on Guerry.
 *
 * Reads the vendored fixture (src/test/resources/guerry.tsv: crm_prs,
 * crm_prp, litercy; src/test/resources/guerry_queen_expected.txt: the
 * reference's own queen neighbor map) and computes, from the published
 * algorithm definitions with no code shared with the Scala engine:
 *
 *   - SKATER (Assuncao et al. 2006): MST over first-order contiguity
 *     edges weighted by euclidean attribute distance, then k-1 greedy
 *     splits maximizing the SSD reduction (firstorder-singlelinkage in
 *     the reference's method naming, lisa.h:119-137);
 *   - REDCAP fullorder-wardlinkage and fullorder-averagelinkage
 *     (Guo 2008): contiguity-constrained agglomerative clustering with
 *     Lance-Williams updates over ALL cluster pairs; each merge adds the
 *     cheapest first-order edge between the merged clusters to the
 *     spanning tree, partitioned by the same SSD splitter.
 *
 * Variables standardized by mean / SAMPLE sd. k = 5. Cluster ids are
 * 1-based by region size descending, ties by smallest member id.
 *
 * Build + run (from repo root):
 *   gcc -O2 -o /tmp/pin_skater tools/pin_guerry_skater.c -lm
 *   /tmp/pin_skater > src/test/resources/guerry_skater_expected.tsv
 *
 * The committed TSV is asserted row-exactly by RegionalizeSpec.
 */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <math.h>
#include <string.h>

#define N_OBS 85
#define NV 3
#define K_REG 5

static double val[NV][N_OBS];
static int *nbrs[N_OBS]; static int n_nbrs[N_OBS];
static int edges_a[1024], edges_b[1024]; static int n_edges = 0;

static void standardize(double *x, int n) {
    double m = 0, s2 = 0;
    for (int i = 0; i < n; i++) m += x[i];
    m /= n;
    for (int i = 0; i < n; i++) { double d = x[i] - m; s2 += d * d; }
    double sd = sqrt(s2 / (n - 1));
    for (int i = 0; i < n; i++) x[i] = sd == 0 ? x[i] - m : (x[i] - m) / sd;
}

static double edist(int i, int j) {
    double s = 0;
    for (int v = 0; v < NV; v++) {
        double d = val[v][i] - val[v][j];
        s += d * d;
    }
    return sqrt(s);
}

/* ---------- union-find (root = min member, as the engine) ---------- */
static int ufp[N_OBS];
static int uf_find(int x) { while (ufp[x] != x) x = ufp[x]; return x; }
static void uf_union(int a, int b) {
    int ra = uf_find(a), rb = uf_find(b);
    if (ra != rb) { if (ra < rb) ufp[rb] = ra; else ufp[ra] = rb; }
}

/* ---------- SSD tree partitioner (shared by SKATER and REDCAP) ------ */
/* tree: n-1 edges; returns labels[] 1-based, size-desc, tie min id.   */
static void partition_tree(int ta[], int tb[], int nt, int k, int *label) {
    int removed[N_OBS]; memset(removed, 0, sizeof(removed));
    int comp[N_OBS];
    int adj_e[N_OBS][16]; int adj_n[N_OBS];

    memset(adj_n, 0, sizeof(adj_n));
    for (int e = 0; e < nt; e++) {
        adj_e[ta[e]][adj_n[ta[e]]++] = e;
        adj_e[tb[e]][adj_n[tb[e]]++] = e;
    }
    void mark(void) {
        for (int i = 0; i < N_OBS; i++) comp[i] = -1;
        int c = 0;
        for (int s = 0; s < N_OBS; s++) if (comp[s] == -1) {
            int stack[N_OBS], top = 0;
            stack[top++] = s; comp[s] = c;
            while (top) {
                int u = stack[--top];
                for (int q = 0; q < adj_n[u]; q++) {
                    int e = adj_e[u][q];
                    if (removed[e]) continue;
                    int w = ta[e] == u ? tb[e] : ta[e];
                    if (comp[w] == -1) { comp[w] = c; stack[top++] = w; }
                }
            }
            c++;
        }
    }
    double ssd_of(const int *mem, int cnt) {
        double t = 0;
        for (int v = 0; v < NV; v++) {
            double s = 0, q = 0;
            for (int i = 0; i < cnt; i++) {
                double x = val[v][mem[i]]; s += x; q += x * x;
            }
            t += q - s * s / cnt;
        }
        return t;
    }
    for (int cut = 0; cut < k - 1; cut++) {
        mark();
        double best_gain = -1e300; int best_e = -1;
        for (int e = 0; e < nt; e++) {
            if (removed[e]) continue;
            /* side A: DFS from ta[e] avoiding edge e */
            int side[N_OBS]; memset(side, 0, sizeof(side));
            int memA[N_OBS], cntA = 0;
            int stack[N_OBS], top = 0;
            stack[top++] = ta[e]; side[ta[e]] = 1;
            while (top) {
                int u = stack[--top];
                memA[cntA++] = u;
                for (int q = 0; q < adj_n[u]; q++) {
                    int e2 = adj_e[u][q];
                    if (removed[e2] || e2 == e) continue;
                    int w = ta[e2] == u ? tb[e2] : ta[e2];
                    if (!side[w]) { side[w] = 1; stack[top++] = w; }
                }
            }
            int memB[N_OBS], cntB = 0, memC[N_OBS], cntC = 0;
            for (int i = 0; i < N_OBS; i++) if (comp[i] == comp[ta[e]]) {
                memC[cntC++] = i;
                if (!side[i]) memB[cntB++] = i;
            }
            if (cntA < 1 || cntB < 1) continue;
            double gain = ssd_of(memC, cntC) - ssd_of(memA, cntA)
                        - ssd_of(memB, cntB);
            if (gain > best_gain) { best_gain = gain; best_e = e; }
        }
        if (best_e < 0) break;
        removed[best_e] = 1;
    }
    mark();
    /* relabel: 1-based by size desc, tie min member id */
    int csize[N_OBS], cmin[N_OBS], nc = 0;
    for (int i = 0; i < N_OBS; i++) if (comp[i] + 1 > nc) nc = comp[i] + 1;
    for (int c = 0; c < nc; c++) { csize[c] = 0; cmin[c] = N_OBS; }
    for (int i = 0; i < N_OBS; i++) {
        csize[comp[i]]++;
        if (i < cmin[comp[i]]) cmin[comp[i]] = i;
    }
    int order[N_OBS];
    for (int c = 0; c < nc; c++) order[c] = c;
    for (int a = 1; a < nc; a++) {  /* insertion sort by (-size, min) */
        int v = order[a], b = a - 1;
        while (b >= 0 && (csize[order[b]] < csize[v] ||
               (csize[order[b]] == csize[v] && cmin[order[b]] > cmin[v]))) {
            order[b + 1] = order[b]; b--;
        }
        order[b + 1] = v;
    }
    int rank[N_OBS];
    for (int r = 0; r < nc; r++) rank[order[r]] = r + 1;
    for (int i = 0; i < N_OBS; i++) label[i] = rank[comp[i]];
}

/* ---------- SKATER: Kruskal MST by (d, a, b) asc ---------- */
static void skater_tree(int ta[], int tb[], int *nt) {
    int idx[1024];
    for (int e = 0; e < n_edges; e++) idx[e] = e;
    /* insertion sort by (d, a, b) */
    double d[1024];
    for (int e = 0; e < n_edges; e++) d[e] = edist(edges_a[e], edges_b[e]);
    for (int a = 1; a < n_edges; a++) {
        int v = idx[a], b = a - 1;
        while (b >= 0 && (d[idx[b]] > d[v] ||
               (d[idx[b]] == d[v] && (edges_a[idx[b]] > edges_a[v] ||
                (edges_a[idx[b]] == edges_a[v] && edges_b[idx[b]] > edges_b[v]))))) {
            idx[b + 1] = idx[b]; b--;
        }
        idx[b + 1] = v;
    }
    for (int i = 0; i < N_OBS; i++) ufp[i] = i;
    *nt = 0;
    for (int q = 0; q < n_edges; q++) {
        int a = edges_a[idx[q]], b = edges_b[idx[q]];
        if (uf_find(a) != uf_find(b)) {
            uf_union(a, b);
            ta[*nt] = a; tb[*nt] = b; (*nt)++;
        }
    }
}

/* ---------- REDCAP full-order (ward=1 or average=0) ---------- */
static double D[N_OBS][N_OBS];
static double bestD[N_OBS][N_OBS]; static int bestA[N_OBS][N_OBS], bestB[N_OBS][N_OBS];
static int contig[N_OBS][N_OBS]; /* adjacency of live roots */
static void redcap_tree(int ward, int ta[], int tb[], int *nt) {
    int live[N_OBS], sizes[N_OBS];
    for (int i = 0; i < N_OBS; i++) { live[i] = 1; sizes[i] = 1; }
    for (int i = 0; i < N_OBS; i++)
        for (int j = 0; j < N_OBS; j++) {
            contig[i][j] = 0; bestD[i][j] = 1e300;
            if (i != j) {
                if (ward) {
                    double ss = 0;
                    for (int v = 0; v < NV; v++) {
                        double dv = val[v][i] - val[v][j]; ss += dv * dv;
                    }
                    D[i][j] = ss / 2.0;
                } else D[i][j] = edist(i, j);
            } else D[i][j] = 0;
        }
    for (int e = 0; e < n_edges; e++) {
        int a = edges_a[e], b = edges_b[e];
        contig[a][b] = contig[b][a] = 1;
        double d = edist(a, b);
        if (d < bestD[a][b]) {
            bestD[a][b] = bestD[b][a] = d;
            bestA[a][b] = bestA[b][a] = a;
            bestB[a][b] = bestB[b][a] = b;
        }
    }
    *nt = 0;
    for (int step = 0; step < N_OBS - 1; step++) {
        /* min (D, i, j) over live contiguous root pairs */
        double md = 1e300; int mi = -1, mj = -1;
        for (int i = 0; i < N_OBS; i++) if (live[i])
            for (int j = i + 1; j < N_OBS; j++)
                if (live[j] && contig[i][j] && D[i][j] < md) {
                    md = D[i][j]; mi = i; mj = j;
                }
        if (mi < 0) break;
        ta[*nt] = bestA[mi][mj]; tb[*nt] = bestB[mi][mj]; (*nt)++;
        /* merge mj into mi (mi < mj = min root, engine convention) */
        double nA = sizes[mi], nB = sizes[mj], d = md;
        /* Lance-Williams over ALL live roots */
        for (int x = 0; x < N_OBS; x++) {
            if (!live[x] || x == mi || x == mj) continue;
            double dAX = D[mi][x], dBX = D[mj][x], dCX;
            if (ward) {
                double nX = sizes[x];
                dCX = ((nA + nX) * dAX + (nB + nX) * dBX - nX * d) /
                      (nA + nB + nX);
            } else {
                dCX = (nA * dAX + nB * dBX) / (nA + nB);
            }
            D[mi][x] = D[x][mi] = dCX;
        }
        /* contiguity + cheapest first-order edge bookkeeping:
         * prefer the mi-side edge on ties (engine's <= rule) */
        for (int x = 0; x < N_OBS; x++) {
            if (!live[x] || x == mi || x == mj) continue;
            int hasA = contig[mi][x] && bestD[mi][x] < 1e300;
            int hasB = contig[mj][x] && bestD[mj][x] < 1e300;
            if (hasA && (!hasB || bestD[mi][x] <= bestD[mj][x])) {
                /* keep mi-side entry */
            } else if (hasB) {
                bestD[mi][x] = bestD[x][mi] = bestD[mj][x];
                bestA[mi][x] = bestA[x][mi] = bestA[mj][x];
                bestB[mi][x] = bestB[x][mi] = bestB[mj][x];
            }
            if (contig[mj][x]) { contig[mi][x] = contig[x][mi] = 1; }
        }
        sizes[mi] += sizes[mj];
        live[mj] = 0;
    }
}

int main(void) {
    /* ---- parse guerry.tsv (crm_prs, crm_prp, litercy) ---- */
    {
        FILE *f = fopen("src/test/resources/guerry.tsv", "r");
        if (!f) { fprintf(stderr, "missing guerry.tsv (run from repo root)\n"); return 1; }
        char *line = NULL; size_t cap = 0;
        if (getline(&line, &cap, f) < 0) return 1;
        int n = 0;
        while (getline(&line, &cap, f) >= 0 && n < N_OBS) {
            char *tok = strtok(line, "\t");        /* ogc_fid */
            tok = strtok(NULL, "\t");              /* wkb */
            for (int v = 0; v < NV; v++) {
                tok = strtok(NULL, "\t\n");
                val[v][n] = atof(tok);
            }
            n++;
        }
        fclose(f); free(line);
        if (n != N_OBS) { fprintf(stderr, "expected 85 rows, got %d\n", n); return 1; }
    }
    /* ---- parse queen map ---- */
    {
        FILE *f = fopen("src/test/resources/guerry_queen_expected.txt", "r");
        if (!f) { fprintf(stderr, "missing queen map\n"); return 1; }
        fseek(f, 0, SEEK_END); long sz = ftell(f); fseek(f, 0, SEEK_SET);
        char *buf = malloc(sz + 1);
        if (fread(buf, 1, sz, f) != (size_t)sz) return 1;
        buf[sz] = 0; fclose(f);
        const char *p = buf;
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
                if (*p == ':') { strtol(p + 1, (char **)&p, 10); }
                tmp[cnt++] = nb;
                if (*p == ',') p++;
            }
            if (*p == '}') p++;
            nbrs[gid] = malloc(cnt * sizeof(int));
            memcpy(nbrs[gid], tmp, cnt * sizeof(int));
            n_nbrs[gid] = cnt;
        }
        free(buf);
    }
    /* dedup edges a < b */
    for (int a = 0; a < N_OBS; a++)
        for (int q = 0; q < n_nbrs[a]; q++) {
            int b = nbrs[a][q];
            if (a < b) { edges_a[n_edges] = a; edges_b[n_edges] = b; n_edges++; }
        }

    for (int v = 0; v < NV; v++) standardize(val[v], N_OBS);

    int ta[N_OBS], tb[N_OBS], nt;
    int lab_skater[N_OBS], lab_ward[N_OBS], lab_avg[N_OBS];

    skater_tree(ta, tb, &nt);
    partition_tree(ta, tb, nt, K_REG, lab_skater);

    redcap_tree(1, ta, tb, &nt);
    partition_tree(ta, tb, nt, K_REG, lab_ward);

    redcap_tree(0, ta, tb, &nt);
    partition_tree(ta, tb, nt, K_REG, lab_avg);

    printf("gid\tskater_k5\tredcap_ward_k5\tredcap_avg_k5\n");
    for (int i = 0; i < N_OBS; i++)
        printf("%d\t%d\t%d\t%d\n", i, lab_skater[i], lab_ward[i], lab_avg[i]);
    return 0;
}
