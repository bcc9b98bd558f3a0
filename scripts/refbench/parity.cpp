/* Reference-kernel PARITY driver.
 *
 * Compiles against the real HIBAG kernel (LibHLA.cpp straight out of
 * /root/reference/src, nothing vendored) and, unlike driver.cpp's
 * throughput stub, provides a bit-exact replica of R's RNG (set.seed
 * scrambling + MT19937 + unif_rand fixup — the same semantics as
 * hibag_tpu/utils/rng.py) so training decisions consume the identical
 * stream as the Python framework with the same seed.
 *
 * Modes:
 *   parity train   data.bin seed nclassifier mtry target out.txt
 *       BuildClassifiers on the exported training set, then dump every
 *       classifier (bootstrap counts, 0-based SNP indices, haplotype
 *       strings + %.17g freqs grouped by HLA allele, OOB accuracy) in the
 *       HIBAG_GetClassifierList schema (reference src/HIBAG.cpp:881-958).
 *   parity predict model.txt pred.bin vote out.bin [target]
 *       Rebuild a model via the CAttrBag_Classifier::Assign injection path
 *       (reference src/LibHLA.cpp:2142-2165, as HIBAG_NewClassifierHaplo
 *       does) and PredictHLA the genotype matrix, dumping best-guess pairs,
 *       max probs, matching and the full posterior matrix as f64 binary.
 *
 * File formats are defined by scripts/parity.py (the Python side).
 */
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <tbb/task_arena.h>

#include "LibHLA.h"

using namespace HLA_LIB;

/* ---------------- R RNG replica (MT19937 + R seeding/fixup) ------------ */

static uint32_t g_mt[624];
static int g_mti = 624;
static long g_draws = 0;   /* total unif_rand draws (consumption tracing) */

extern "C" void stub_set_seed(unsigned int seed)
{
    uint32_t s = seed;
    for (int i = 0; i < 50; i++) s = 69069u * s + 1u;
    /* R fills 625 words for MT; the first is the (overwritten) index word */
    s = 69069u * s + 1u; /* words[0], discarded */
    for (int j = 0; j < 624; j++) {
        s = 69069u * s + 1u;
        g_mt[j] = s;
    }
    g_mti = 624;
}

static void mt_twist(void)
{
    const uint32_t UP = 0x80000000u, LO = 0x7fffffffu, MA = 0x9908b0dfu;
    int kk;
    uint32_t y;
    for (kk = 0; kk < 624 - 397; kk++) {
        y = (g_mt[kk] & UP) | (g_mt[kk + 1] & LO);
        g_mt[kk] = g_mt[kk + 397] ^ (y >> 1) ^ ((y & 1) ? MA : 0);
    }
    for (; kk < 623; kk++) {
        y = (g_mt[kk] & UP) | (g_mt[kk + 1] & LO);
        g_mt[kk] = g_mt[kk + 397 - 624] ^ (y >> 1) ^ ((y & 1) ? MA : 0);
    }
    y = (g_mt[623] & UP) | (g_mt[0] & LO);
    g_mt[623] = g_mt[396] ^ (y >> 1) ^ ((y & 1) ? MA : 0);
    g_mti = 0;
}

extern "C" double unif_rand(void)
{
    g_draws++;
    if (g_mti >= 624) mt_twist();
    uint32_t y = g_mt[g_mti++];
    y ^= y >> 11;
    y ^= (y << 7) & 0x9d2c5680u;
    y ^= (y << 15) & 0xefc60000u;
    y ^= y >> 18;
    /* R's fixup: u32/(2^32-1) forced into the open interval (0,1) */
    const double i2_32m1 = 2.3283064365386963e-10;
    double v = y * i2_32m1;
    if (v <= 0.0) return 0.5 * i2_32m1;
    if (1.0 - v <= 0.0) return 1.0 - 0.5 * i2_32m1;
    return v;
}

/* ----------------------------- helpers --------------------------------- */

static int die(const char *msg)
{
    fprintf(stderr, "parity: %s\n", msg);
    return 2;
}

static int run_train(int argc, char **argv)
{
    if (argc < 6) return die("train data.bin seed nclassifier mtry target out.txt");
    const char *path = argv[0];
    unsigned seed = (unsigned)atoi(argv[1]);
    int nclassifier = atoi(argv[2]);
    int mtry = atoi(argv[3]);
    const char *target = argv[4];
    const char *outp = argv[5];

    FILE *f = fopen(path, "rb");
    if (!f) return die("cannot open data.bin");
    int32_t hdr[3];
    if (fread(hdr, 4, 3, f) != 3) return die("bad header");
    int n_samp = hdr[0], n_snp = hdr[1], n_hla = hdr[2];
    std::vector<int32_t> geno((size_t)n_samp * n_snp), h1(n_samp), h2(n_samp);
    if (fread(geno.data(), 4, geno.size(), f) != geno.size() ||
        fread(h1.data(), 4, h1.size(), f) != h1.size() ||
        fread(h2.data(), 4, h2.size(), f) != h2.size())
        return die("short read");
    fclose(f);

    CAlg_Prediction::Init_Target_IFunc(target);
    stub_set_seed(seed);

    bool detail = getenv("PARITY_DETAIL") != NULL;
    bool trace_pool = getenv("PARITY_TRACE_POOL") != NULL;
    /* wrapper that logs every candidate selection + pool mutation so the
     * Python side can reconcile per-step pool bookkeeping draw-for-draw
     * (CBaseSampling virtual interface, reference LibHLA.h:230-248) */
    struct LoggingSampler : public CBaseSampling {
        CSamplingWithoutReplace inner;
        int step = 0;
        int TotalNum() const override {
            return const_cast<CSamplingWithoutReplace&>(inner).TotalNum();
        }
        void RandomSelect(int m_try) override {
            inner.RandomSelect(m_try);
            fprintf(stderr, "POOL step %d total %d sel", step++,
                    inner.TotalNum());
            for (int i = 0; i < inner.NumOfSelection(); i++)
                fprintf(stderr, " %d", inner[i]);
            fprintf(stderr, "\n");
        }
        int NumOfSelection() const override {
            return const_cast<CSamplingWithoutReplace&>(
                inner).NumOfSelection();
        }
        void Remove(int idx) override {
            fprintf(stderr, "POOL remove %d\n", inner[idx]);
            inner.Remove(idx);
        }
        void RemoveSelection() override {
            fprintf(stderr, "POOL remove_selection\n");
            inner.RemoveSelection();
        }
        void RemoveFlag() override {
            fprintf(stderr, "POOL remove_flag:");
            for (int i = 0; i < inner.NumOfSelection(); i++)
                if (inner[i] < 0) fprintf(stderr, " %d", i);
            fprintf(stderr, "\n");
            inner.RemoveFlag();
        }
        int &operator[](int idx) override { return inner[idx]; }
    };
    CAttrBag_Model model;
    model.InitTraining(n_snp, n_samp, geno.data(), n_hla,
                       h1.data(), h2.data());
    tbb::task_arena arena(1);  /* single-thread: deterministic summation */
    arena.execute([&] {
        if (detail) {
            /* per-classifier loop (the public NewClassifierBootstrap+Grow
             * pair BuildClassifiers uses) so per-classifier RNG consumption
             * and accepted-step detail lines can be traced */
            LoggingSampler logging_sampler;
            CSamplingWithoutReplace plain_sampler;
            for (int k = 0; k < nclassifier; k++) {
                long d0 = g_draws;
                CAttrBag_Classifier *c = model.NewClassifierBootstrap();
                long d1 = g_draws;
                CBaseSampling &sampler = trace_pool
                    ? (CBaseSampling&)logging_sampler
                    : (CBaseSampling&)plain_sampler;
                if (trace_pool) {
                    logging_sampler.inner.Init(n_snp);
                    logging_sampler.step = 0;
                } else
                    plain_sampler.Init(n_snp);
                fprintf(stderr, "== classifier %d (bootstrap draws %ld)\n",
                        k, d1 - d0);
                c->Grow(sampler, mtry, true, false, true);
                fprintf(stderr, "== classifier %d done: grow draws %ld, "
                        "acc %.17g\n", k, g_draws - d1,
                        c->OutOfBag_Accuracy());
            }
        } else {
            model.BuildClassifiers(nclassifier, mtry, true, false, false);
        }
    });

    FILE *o = fopen(outp, "w");
    if (!o) return die("cannot open out.txt");
    fprintf(o, "n_samp %d\nn_snp %d\nn_hla %d\nn_classifier %d\n",
            n_samp, n_snp, n_hla, (int)model.ClassifierList().size());
    int k = 0;
    for (const CAttrBag_Classifier &c : model.ClassifierList()) {
        fprintf(o, "classifier %d\n", k++);
        fprintf(o, "acc %.17g\n", c.OutOfBag_Accuracy());
        fprintf(o, "bootstrap");
        for (int b : c.BootstrapCount()) fprintf(o, " %d", b);
        fprintf(o, "\nsnpidx");
        for (int s : c.SNPIndex()) fprintf(o, " %d", s);
        fprintf(o, "\nnhaplo %d\n", (int)c.nHaplo());
        const CHaplotypeList &H = c.Haplotype();
        size_t idx = 0;
        for (size_t a = 0; a < H.LenPerHLA.size(); a++) {
            for (size_t j = 0; j < H.LenPerHLA[a]; j++, idx++) {
                const THaplotype &hp = H.List[idx];
                fprintf(o, "%d %.17g %s\n", (int)a, hp.Freq,
                        hp.HaploToStr(H.Num_SNP).c_str());
            }
        }
    }
    fclose(o);
    return 0;
}

static int run_predict(int argc, char **argv)
{
    if (argc < 4) return die("predict model.txt pred.bin vote out.bin [target]");
    const char *modp = argv[0];
    const char *predp = argv[1];
    int vote = atoi(argv[2]);
    const char *outp = argv[3];
    const char *target = argc > 4 ? argv[4] : "max";

    CAlg_Prediction::Init_Target_IFunc(target);

    FILE *m = fopen(modp, "r");
    if (!m) return die("cannot open model.txt");
    int n_snp, n_samp, n_hla, n_cls;
    if (fscanf(m, "n_snp %d n_samp %d n_hla %d n_classifier %d",
               &n_snp, &n_samp, &n_hla, &n_cls) != 4)
        return die("bad model header");
    CAttrBag_Model model;
    model.InitTraining(n_snp, n_samp > 0 ? n_samp : 1, n_hla);
    for (int k = 0; k < n_cls; k++) {
        int kk, nsnp, nhap;
        double acc;
        if (fscanf(m, " classifier %d acc %lf nsnp %d", &kk, &acc, &nsnp) != 3)
            return die("bad classifier header");
        std::vector<int> snpidx(nsnp);
        for (int i = 0; i < nsnp; i++)
            if (fscanf(m, "%d", &snpidx[i]) != 1) return die("bad snpidx");
        if (fscanf(m, " nhaplo %d", &nhap) != 1) return die("bad nhaplo");
        std::vector<double> freq(nhap);
        std::vector<int> hla(nhap);
        std::vector<std::string> hstr(nhap);
        char buf[256];
        for (int i = 0; i < nhap; i++) {
            if (fscanf(m, "%d %lf %255s", &hla[i], &freq[i], buf) != 3)
                return die("bad haplotype line");
            hstr[i] = buf;
        }
        std::vector<const char *> hp(nhap);
        for (int i = 0; i < nhap; i++) hp[i] = hstr[i].c_str();
        CAttrBag_Classifier *c = model.NewClassifierAllSamp();
        c->Assign(nsnp, snpidx.data(), NULL, nhap, freq.data(), hla.data(),
                  hp.data(), &acc);
    }
    fclose(m);

    FILE *p = fopen(predp, "rb");
    if (!p) return die("cannot open pred.bin");
    int32_t ph[2];
    if (fread(ph, 4, 2, p) != 2) return die("bad pred header");
    int np = ph[0];
    if (ph[1] != n_snp) return die("pred n_snp != model n_snp");
    std::vector<int32_t> pg((size_t)np * n_snp);
    if (fread(pg.data(), 4, pg.size(), p) != pg.size())
        return die("short pred read");
    fclose(p);

    int ntri = n_hla * (n_hla + 1) / 2;
    std::vector<int> oh1(np), oh2(np);
    std::vector<double> maxprob(np), matching(np);
    std::vector<double> prob((size_t)np * ntri);
    std::vector<double> dosage((size_t)np * n_hla);
    tbb::task_arena arena(1);
    arena.execute([&] {
        model.PredictHLA(pg.data(), np, vote, oh1.data(), oh2.data(),
                         maxprob.data(), matching.data(), dosage.data(),
                         prob.data(), false);
    });

    FILE *o = fopen(outp, "wb");
    if (!o) return die("cannot open out.bin");
    int32_t oh[2] = {(int32_t)np, (int32_t)n_hla};
    fwrite(oh, 4, 2, o);
    std::vector<int32_t> t1(oh1.begin(), oh1.end()), t2(oh2.begin(), oh2.end());
    fwrite(t1.data(), 4, np, o);
    fwrite(t2.data(), 4, np, o);
    fwrite(maxprob.data(), 8, np, o);
    fwrite(matching.data(), 8, np, o);
    fwrite(prob.data(), 8, prob.size(), o);
    fwrite(dosage.data(), 8, dosage.size(), o);
    fclose(o);
    return 0;
}

int main(int argc, char **argv)
{
    if (argc < 2) return die("usage: parity train|predict|rng ...");
    if (!strcmp(argv[1], "train"))
        return run_train(argc - 2, argv + 2);
    if (!strcmp(argv[1], "predict"))
        return run_predict(argc - 2, argv + 2);
    if (!strcmp(argv[1], "rng")) {
        /* sanity channel: dump n draws for a seed (cross-check vs rng.py) */
        if (argc < 4) return die("rng seed n");
        stub_set_seed((unsigned)atoi(argv[2]));
        int n = atoi(argv[3]);
        for (int i = 0; i < n; i++) printf("%.17g\n", unif_rand());
        return 0;
    }
    return die("unknown mode");
}
