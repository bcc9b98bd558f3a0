// hibag_tpu native runtime: high-throughput host-side data preparation.
//
// TPU-native counterpart of the reference's native data layer
// (HIBAG_ConvBED src/HIBAG.cpp:1094-1191, TGenotype packing
// src/LibHLA.cpp:585-829): the TPU compute path consumes dense int8 code
// matrices, so the native layer's job is decode/pack/align throughput for
// biobank-scale inputs, not SIMD scoring (that lives in XLA/Pallas).
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).
//
// Build: make -C native   (produces libhibag_native.so)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Decode PLINK BED 2-bit genotypes (SNP-major) into int8 codes
// {0,1,2,3=missing}, one row per kept SNP.
//   raw:      packed bytes, n_snp rows of stride ceil(n_samp/4)
//   keep_idx: indices of SNPs to decode (n_keep)
//   out:      [n_keep, n_samp] int8
void hibag_bed_decode(const uint8_t* raw, int64_t n_snp, int64_t n_samp,
                      const int64_t* keep_idx, int64_t n_keep,
                      int8_t* out, int n_threads) {
    static int8_t lut[256][4];
    static bool init = false;
    if (!init) {
        const int8_t cvt[4] = {2, 3, 1, 0};
        for (int b = 0; b < 256; b++)
            for (int k = 0; k < 4; k++)
                lut[b][k] = cvt[(b >> (2 * k)) & 3];
        init = true;
    }
    const int64_t stride = (n_samp + 3) / 4;
    if (n_threads < 1) n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;

    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const uint8_t* src = raw + keep_idx[i] * stride;
            int8_t* dst = out + i * n_samp;
            int64_t j = 0;
            for (int64_t b = 0; b < stride - 1; b++) {
                const int8_t* v = lut[src[b]];
                dst[j++] = v[0]; dst[j++] = v[1];
                dst[j++] = v[2]; dst[j++] = v[3];
            }
            const int8_t* v = lut[src[stride - 1]];
            for (int k = 0; j < n_samp; j++, k++) dst[j] = v[k];
        }
    };
    if (n_threads == 1 || n_keep < 256) {
        work(0, n_keep);
    } else {
        std::vector<std::thread> ts;
        int64_t chunk = (n_keep + n_threads - 1) / n_threads;
        for (int t = 0; t < n_threads; t++) {
            int64_t lo = t * chunk, hi = lo + chunk;
            if (lo >= n_keep) break;
            if (hi > n_keep) hi = n_keep;
            ts.emplace_back(work, lo, hi);
        }
        for (auto& t : ts) t.join();
    }
}

// Gather + allele-flip target genotypes into a model's SNP space.
//   geno:    [P_t, N] int8 target codes
//   src_idx: per model SNP: source row in geno, or -1 (missing)
//   flip:    per model SNP: 1 = code := 2 - code
//   out:     [N, P_m] int8, missing slots = 3
void hibag_align_codes(const int8_t* geno, int64_t p_t, int64_t n,
                       const int64_t* src_idx, const uint8_t* flip,
                       int64_t p_m, int8_t* out, int n_threads) {
    if (n_threads < 1) n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t s = lo; s < hi; s++) {     // sample-major output rows
            int8_t* dst = out + s * p_m;
            for (int64_t m = 0; m < p_m; m++) {
                int64_t src = src_idx[m];
                if (src < 0) { dst[m] = 3; continue; }
                int8_t g = geno[src * n + s];
                if (g > 2) { dst[m] = 3; continue; }
                dst[m] = flip[m] ? (int8_t)(2 - g) : g;
            }
        }
    };
    if (n_threads == 1 || n < 128) {
        work(0, n);
    } else {
        std::vector<std::thread> ts;
        int64_t chunk = (n + n_threads - 1) / n_threads;
        for (int t = 0; t < n_threads; t++) {
            int64_t lo = t * chunk, hi = lo + chunk;
            if (lo >= n) break;
            if (hi > n) hi = n;
            ts.emplace_back(work, lo, hi);
        }
        for (auto& t : ts) t.join();
    }
}

// Pack haplotype bit strings ('0'/'1' chars, fixed width) into a dense
// {0,1} float32 matrix (device upload layout).
void hibag_pack_haplo(const char* strs, int64_t n_haplo, int64_t n_snp,
                      int64_t pad_snp, float* out) {
    for (int64_t h = 0; h < n_haplo; h++) {
        const char* s = strs + h * n_snp;
        float* dst = out + h * pad_snp;
        for (int64_t j = 0; j < n_snp; j++)
            dst[j] = (s[j] == '1') ? 1.0f : 0.0f;
    }
}

// Parse the sample columns of one VCF data line into REF-allele counts.
//   cells:    pointer to the first sample column (the byte after the
//             FORMAT field's tab), tab-separated, ends at len
//   gt_index: 0-based position of GT within the colon-separated FORMAT
//   out:      [n_samples] uint8 filled with 0/1/2 (copies of REF, capped
//             at 2) or 3 = missing ('.' alleles are skipped; a cell with
//             no numeric allele is missing — matching io/vcf_in.py's
//             Python fallback exactly)
// Returns the number of cells parsed (for validation against n_samples).
int64_t hibag_vcf_gt_codes(const char* cells, int64_t len, int32_t gt_index,
                           uint8_t* out, int64_t n_samples) {
    const char* p = cells;
    const char* end = cells + len;
    int64_t s = 0;
    while (s < n_samples && p <= end) {
        // locate the GT field within this cell
        int colon = 0;
        while (colon < gt_index && p < end && *p != '\t') {
            if (*p == ':') colon++;
            p++;
        }
        int refcnt = 0, seen = 0, bad = 0;
        if (colon == gt_index) {
            while (p < end && *p != '\t' && *p != ':') {
                char c = *p;
                if (c >= '0' && c <= '9') {
                    int v = 0;
                    while (p < end && *p >= '0' && *p <= '9') {
                        v = v * 10 + (*p - '0');
                        p++;
                    }
                    seen++;
                    if (v == 0) refcnt++;
                } else if (c == '.' || c == '/' || c == '|') {
                    p++;
                } else {
                    // non-numeric allele token (e.g. "1/A"): the whole
                    // cell is missing, matching the Python fallback's
                    // int() ValueError path in io/vcf_in.py
                    bad = 1;
                    p++;
                }
            }
        }
        out[s++] = (seen && !bad) ? (uint8_t)(refcnt > 2 ? 2 : refcnt)
                                  : (uint8_t)3;
        // skip the rest of the cell
        while (p < end && *p != '\t') p++;
        p++;  // the tab (or one past end)
    }
    return s;
}

// Per-SNP allele frequency and missing rate over an int8 code matrix
// geno [P, N]; outputs freq[P], miss[P].
void hibag_snp_stats(const int8_t* geno, int64_t p, int64_t n,
                     double* freq, double* miss, int n_threads) {
    if (n_threads < 1) n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads < 1) n_threads = 1;
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            const int8_t* row = geno + i * n;
            int64_t cnt = 0, valid = 0;
            for (int64_t j = 0; j < n; j++) {
                int8_t g = row[j];
                if (g <= 2) { cnt += g; valid++; }
            }
            freq[i] = valid ? (double)cnt / (2.0 * valid) : 0.0;
            miss[i] = 1.0 - (double)valid / n;
        }
    };
    if (n_threads == 1 || p < 1024) {
        work(0, p);
    } else {
        std::vector<std::thread> ts;
        int64_t chunk = (p + n_threads - 1) / n_threads;
        for (int t = 0; t < n_threads; t++) {
            int64_t lo = t * chunk, hi = lo + chunk;
            if (lo >= p) break;
            if (hi > p) hi = p;
            ts.emplace_back(work, lo, hi);
        }
        for (auto& t : ts) t.join();
    }
}

}  // extern "C"
