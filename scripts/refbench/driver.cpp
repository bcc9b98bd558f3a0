/* Standalone benchmark driver for the reference HIBAG CPU kernel.
 *
 * Compiles LibHLA.cpp + the SIMD target files straight out of
 * /root/reference/src (read-only; nothing vendored) against the stub R
 * headers in ./stubs, then measures classifiers/s for BuildClassifiers on
 * a training set exported by scripts/export_baseline_data.py.
 *
 * Usage: driver <data.bin> <nclassifier> <nthread> <target> [seed] [npred]
 *   target: "max" | "avx512bw" | "avx2" | ... (CAlg_Prediction kernel)
 *   npred:  if > 0, also time PredictHLA on npred resampled individuals
 * Prints one JSON line per phase with wall-clock and throughput.
 */
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

#include <tbb/task_arena.h>

#include "LibHLA.h"

using namespace HLA_LIB;

static std::mt19937 g_rng(1);

extern "C" double unif_rand(void)
{
    /* R's unif_rand contract: uniform on [0,1). Any good generator is fine
     * for throughput measurement (decision paths differ per draw but the
     * work per classifier is statistically identical). */
    return std::generate_canonical<double, 32>(g_rng);
}

extern "C" void stub_set_seed(unsigned int seed) { g_rng.seed(seed); }

int main(int argc, char **argv)
{
    if (argc < 5) {
        fprintf(stderr,
                "usage: %s data.bin nclassifier nthread target [seed]\n",
                argv[0]);
        return 2;
    }
    const char *path = argv[1];
    int nclassifier = atoi(argv[2]);
    int nthread = atoi(argv[3]);
    const char *target = argv[4];
    unsigned seed = argc > 5 ? (unsigned)atoi(argv[5]) : 100u;

    FILE *f = fopen(path, "rb");
    if (!f) { perror("open data"); return 2; }
    int32_t hdr[3];
    if (fread(hdr, 4, 3, f) != 3) { fprintf(stderr, "bad header\n"); return 2; }
    int n_samp = hdr[0], n_snp = hdr[1], n_hla = hdr[2];
    std::vector<int32_t> geno((size_t)n_samp * n_snp), h1(n_samp), h2(n_samp);
    if (fread(geno.data(), 4, geno.size(), f) != geno.size() ||
        fread(h1.data(), 4, h1.size(), f) != h1.size() ||
        fread(h2.data(), 4, h2.size(), f) != h2.size()) {
        fprintf(stderr, "short read\n");
        return 2;
    }
    fclose(f);

    CAlg_Prediction::Init_Target_IFunc(target);
    stub_set_seed(seed);

    CAttrBag_Model model;
    model.InitTraining(n_snp, n_samp, geno.data(), n_hla,
                       h1.data(), h2.data());

    int mtry = (int)ceil(sqrt((double)n_snp));

    auto t0 = std::chrono::steady_clock::now();
    tbb::task_arena arena(nthread);
    arena.execute([&] {
        model.BuildClassifiers(nclassifier, mtry, true, false, false);
    });
    auto t1 = std::chrono::steady_clock::now();
    double dt = std::chrono::duration<double>(t1 - t0).count();

    printf("{\"metric\": \"ref_train_classifiers_per_s\", "
           "\"value\": %.4f, \"unit\": \"classifiers/s\", "
           "\"seconds\": %.2f, \"n_samp\": %d, \"n_snp\": %d, "
           "\"n_hla\": %d, \"nclassifier\": %d, \"nthread\": %d, "
           "\"target\": \"%s\", \"cpu\": \"%s\"}\n",
           nclassifier / dt, dt, n_samp, n_snp, n_hla, nclassifier,
           nthread, target, CPU_Info());

    int npred = argc > 6 ? atoi(argv[6]) : 0;
    if (npred > 0) {
        /* resample individuals from the training matrix to npred samples */
        std::vector<int32_t> pg((size_t)npred * n_snp);
        for (int i = 0; i < npred; i++) {
            int k = (int)(unif_rand() * n_samp);
            if (k >= n_samp) k = n_samp - 1;
            memcpy(&pg[(size_t)i * n_snp], &geno[(size_t)k * n_snp],
                   (size_t)n_snp * 4);
        }
        std::vector<int> oh1(npred), oh2(npred);
        std::vector<double> maxprob(npred), matching(npred);
        auto p0 = std::chrono::steady_clock::now();
        arena.execute([&] {
            model.PredictHLA(pg.data(), npred, 1, oh1.data(), oh2.data(),
                             maxprob.data(), matching.data(), NULL, NULL,
                             false);
        });
        auto p1 = std::chrono::steady_clock::now();
        double pdt = std::chrono::duration<double>(p1 - p0).count();
        printf("{\"metric\": \"ref_predict_samples_per_s\", "
               "\"value\": %.1f, \"unit\": \"samples/s\", "
               "\"seconds\": %.2f, \"n_pred\": %d, \"nclassifier\": %d, "
               "\"nthread\": %d, \"target\": \"%s\"}\n",
               npred / pdt, pdt, npred, nclassifier, nthread, target);
    }
    return 0;
}
