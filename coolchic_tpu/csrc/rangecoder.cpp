// Host-side entropy coding for coolchic_tpu.
//
// 1) A range encoder/decoder compatible with the `constriction` crate's
//    queue RangeEncoder/RangeDecoder (State=u64, Word=u32, PRECISION=24)
//    with the QuantizedLaplace(-64, 63) leaky-quantizer model family.
//    This is required to decode reference Cool-Chic bitstreams bit-exactly
//    (reference: coolchic/bitstream/component/rangecoder.py:25-94).
//
// 2) A full-latent-grid wavefront codec: the fixed-point ARM (int64
//    arithmetic, reference coolchic/bitstream/component/armint.py) runs
//    inline with symbol decoding, so one C call decodes a whole grid instead
//    of one Python->native crossing per wavefront diagonal.
//
// Build: g++ -O3 -march=native -shared -fPIC rangecoder.cpp -o libcoolchic_rc.so

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>
#include <memory>

namespace {

constexpr int PRECISION = 24;
constexpr int SYM_MIN = -64;
constexpr int SYM_MAX = 63;
// Leaky quantizer: max_probability - (support_size - 1) = (2^24 - 1) - 127.
constexpr double FREE_WEIGHT = double((1u << PRECISION) - 1 - (SYM_MAX - SYM_MIN));
constexpr uint64_t RENORM_LIMIT = 1ull << 32;
constexpr uint32_t QUANTILE_MAX = (1u << PRECISION) - 1;

inline double laplace_cdf(double x, double mu, double b) {
    if (x < mu) return 0.5 * std::exp((x - mu) / b);
    return 1.0 - 0.5 * std::exp(-(x - mu) / b);
}

// Left-sided cumulative of the leaky-quantized Laplace.
inline uint32_t left_cum(int s, double mu, double b) {
    if (s <= SYM_MIN) return 0;
    uint32_t slack = uint32_t(s - SYM_MIN);
    return uint32_t(FREE_WEIGHT * laplace_cdf(double(s) - 0.5, mu, b)) + slack;
}

inline uint32_t right_cum_minus_left(int s, double mu, double b, uint32_t left) {
    if (s >= SYM_MAX) return uint32_t((1u << PRECISION) - left);
    uint32_t slack = uint32_t(s - SYM_MIN);
    uint32_t right = uint32_t(FREE_WEIGHT * laplace_cdf(double(s) + 0.5, mu, b)) + slack + 1;
    return right - left;
}

// Find s maximal with left_cum(s) <= quantile, via the closed-form Laplace
// quantile as an initial guess, then a local walk (left_cum is strictly
// increasing thanks to the leak).
inline int invert_quantile(uint32_t quantile, double mu, double b) {
    double p = (double(quantile) + 0.5) / double(1u << PRECISION);
    double x;
    if (p < 0.5) x = mu + b * std::log(2.0 * p);
    else x = mu - b * std::log(2.0 - 2.0 * p);
    int s = int(std::lround(x));
    if (s < SYM_MIN) s = SYM_MIN;
    if (s > SYM_MAX) s = SYM_MAX;
    while (s > SYM_MIN && left_cum(s, mu, b) > quantile) --s;
    while (s < SYM_MAX && left_cum(s + 1, mu, b) <= quantile) ++s;
    return s;
}

struct Encoder {
    uint64_t lower = 0;
    uint64_t range = ~0ull;
    std::vector<uint32_t> words;

    void encode(uint32_t left, uint32_t prob) {
        uint64_t scale = range >> PRECISION;
        uint64_t new_lower = lower + scale * uint64_t(left);
        if (new_lower < lower) {  // carry into already-emitted words
            for (size_t i = words.size(); i-- > 0;) {
                if (++words[i] != 0) break;
            }
        }
        lower = new_lower;
        range = scale * uint64_t(prob);
        if (range < RENORM_LIMIT) {
            words.push_back(uint32_t(lower >> 32));
            lower <<= 32;
            range <<= 32;
        }
    }

    // Seal: emit the smallest point >= lower that is all-zero after one more
    // word. Guaranteed inside [lower, lower + range) since range >= 2^32.
    // The decoder zero-pads past the end of the stream, so this is the
    // shortest self-consistent termination.
    void seal() {
        uint64_t hi = lower >> 32;
        if (lower & 0xffffffffull) {
            ++hi;
            if (hi >> 32) {  // carry into emitted words, then the word is 0
                for (size_t i = words.size(); i-- > 0;) {
                    if (++words[i] != 0) break;
                }
                hi = 0;
            }
        }
        words.push_back(uint32_t(hi));
    }
};

struct Decoder {
    const uint32_t* words = nullptr;
    int64_t n_words = 0;
    int64_t pos = 0;
    uint64_t lower = 0;
    uint64_t range = ~0ull;
    uint64_t point = 0;

    void init(const uint32_t* w, int64_t n) {
        words = w;
        n_words = n;
        pos = 0;
        lower = 0;
        range = ~0ull;
        point = (next() << 32) | next();
    }

    uint64_t next() { return pos < n_words ? uint64_t(words[pos++]) : 0ull; }

    int decode(double mu, double b) {
        uint64_t scale = range >> PRECISION;
        uint64_t quantile = (point - lower) / scale;  // wrapping subtraction
        if (quantile > QUANTILE_MAX) quantile = QUANTILE_MAX;
        int s = invert_quantile(uint32_t(quantile), mu, b);
        uint32_t left = left_cum(s, mu, b);
        uint32_t prob = right_cum_minus_left(s, mu, b, left);
        advance(scale, left, prob);
        return s;
    }

    inline void advance(uint64_t scale, uint32_t left, uint32_t prob) {
        lower += scale * uint64_t(left);
        range = scale * uint64_t(prob);
        if (range < RENORM_LIMIT) {
            lower <<= 32;
            range <<= 32;
            point = (point << 32) | next();
        }
    }

    inline uint32_t quantile() const {
        uint64_t scale = range >> PRECISION;
        uint64_t q = (point - lower) / scale;
        return q > QUANTILE_MAX ? QUANTILE_MAX : uint32_t(q);
    }
};

// ---------------------------------------------------------------------------
// (mu, scale) dequantization tables (mu_scale.npy equivalent).
// ---------------------------------------------------------------------------
std::vector<float> g_mu_table;
std::vector<float> g_scale_table;

inline void lookup(int64_t idx_mu, int64_t idx_sc, double* mu, double* sc) {
    int64_t n_mu = int64_t(g_mu_table.size());
    int64_t n_sc = int64_t(g_scale_table.size());
    if (idx_mu < 0) idx_mu = 0;
    if (idx_mu >= n_mu) idx_mu = n_mu - 1;
    if (idx_sc < 0) idx_sc = 0;
    if (idx_sc >= n_sc) idx_sc = n_sc - 1;
    *mu = double(g_mu_table[size_t(idx_mu)]);
    *sc = double(g_scale_table[size_t(idx_sc)]);
}

// ---------------------------------------------------------------------------
// Per-scale exp tables. Every CDF evaluation during grid coding has the form
// exp(((s +- 0.5) - mu) / b) where both s +- 0.5 and mu are exact multiples of
// 2^-8 -- so exp only ever sees arguments m * 2^-8 (m integer <= 0). Caching
// std::exp of those arguments per distinct scale removes ALL transcendental
// calls from the per-symbol hot loop while remaining bit-identical (the
// tabulated argument m * (1/256) is the same double as the direct
// subtraction, both being exact).
// ---------------------------------------------------------------------------
constexpr int EXPTAB_MAX_M = 33024;  // covers |s*256 - 128 - mu_fp| for the full range
constexpr int MAX_SCALE_TABLES = 512;  // ~135 MB hard cap on memo memory

struct ScaleExpTable {
    double b = 0.0;
    std::vector<double> tab;  // lazily memoized exp(-(m * 2^-8) / b), -1 = unset

    void init(double scale) {
        b = scale;
        tab.assign(EXPTAB_MAX_M + 1, -1.0);
    }

    inline double expm(int m) {  // m >= 0
        double v = tab[size_t(m)];
        if (v < 0.0) {
            v = std::exp((double(-m) * (1.0 / 256.0)) / b);
            tab[size_t(m)] = v;
        }
        return v;
    }
};

// Global: tables depend only on the normative scale table, so the memo is
// shared across grids / frames / images within the process.
struct ScaleTableCache {
    std::vector<std::unique_ptr<ScaleExpTable>> slots;

    ScaleExpTable* get(int64_t idx_sc_raw) {
        int64_t n_sc = int64_t(g_scale_table.size());
        if (n_sc == 0) return nullptr;
        size_t idx = size_t(idx_sc_raw < 0 ? 0 : (idx_sc_raw >= n_sc ? n_sc - 1 : idx_sc_raw));
        if (slots.size() != size_t(n_sc)) {
            slots.clear();
            slots.resize(size_t(n_sc));
        }
        if (!slots[idx]) {
            int n_live = 0;
            for (auto& s : slots) n_live += bool(s);
            if (n_live >= MAX_SCALE_TABLES) return nullptr;  // fall back to direct exp
            slots[idx] = std::make_unique<ScaleExpTable>();
            slots[idx]->init(double(g_scale_table[idx]));
        }
        return slots[idx].get();
    }
};

ScaleTableCache g_scale_cache;

// Laplace CDF at (s - 0.5) given mu = mu_fp * 2^-8: argument index
// m = s*256 - 128 - mu_fp (sign decides the branch).
inline double laplace_cdf_tab(int m, ScaleExpTable* t) {
    if (m < 0) return 0.5 * t->expm(-m);
    return 1.0 - 0.5 * t->expm(m);
}

inline uint32_t left_cum_tab(int s, int mu_fp, ScaleExpTable* t) {
    if (s <= SYM_MIN) return 0;
    int m = s * 256 - 128 - mu_fp;
    return uint32_t(FREE_WEIGHT * laplace_cdf_tab(m, t)) + uint32_t(s - SYM_MIN);
}

inline uint32_t right_cum_minus_left_tab(int s, int mu_fp, ScaleExpTable* t,
                                         uint32_t left) {
    if (s >= SYM_MAX) return uint32_t((1u << PRECISION) - left);
    int m = s * 256 + 128 - mu_fp;
    uint32_t right = uint32_t(FREE_WEIGHT * laplace_cdf_tab(m, t)) + uint32_t(s - SYM_MIN) + 1;
    return right - left;
}

inline int invert_quantile_tab(uint32_t quantile, double mu, int mu_fp,
                               ScaleExpTable* t) {
    double p = (double(quantile) + 0.5) / double(1u << PRECISION);
    double x;
    if (p < 0.5) x = mu + t->b * std::log(2.0 * p);
    else x = mu - t->b * std::log(2.0 - 2.0 * p);
    int s = int(std::lround(x));
    if (s < SYM_MIN) s = SYM_MIN;
    if (s > SYM_MAX) s = SYM_MAX;
    while (s > SYM_MIN && left_cum_tab(s, mu_fp, t) > quantile) --s;
    while (s < SYM_MAX && left_cum_tab(s + 1, mu_fp, t) <= quantile) ++s;
    return s;
}

// ---------------------------------------------------------------------------
// Fixed-point ARM (int64), reference armint.py:180-203.
// ---------------------------------------------------------------------------
constexpr int WEIGHT_SHIFT = 16;
constexpr int N_FRAC_BIT_MU_SCALE = 8;
constexpr int OUTPUT_SHIFT = 2 * WEIGHT_SHIFT - N_FRAC_BIT_MU_SCALE;
constexpr int64_t MU_MIN_FP = int64_t(SYM_MIN) * 256;   // -64 << 8
constexpr int64_t LOG_SCALE_MIN_FP = int64_t(-5) * 256;  // -5 << 8

struct ArmFixedPoint {
    int dim = 0;          // total context count C
    int n_out = 2;        // outputs of the last layer (2 for ARM, C_f for IFCE)
    int n_trunk = 0;      // number of trunk linear layers (n_hidden + 1)
    // weights[l]: [in, out] row-major (pre-transposed, x @ W convention).
    std::vector<std::vector<int64_t>> weights;
    std::vector<std::vector<int64_t>> biases;   // [out]
    std::vector<int64_t> stab_w;                // [dim, n_out]
    std::vector<int64_t> stab_b;                // [n_out]

    // ctx: [dim] raw integer contexts (spatial already plain ints, IFCE
    // columns pre-scaled by 2^8 handled in the weights).
    inline void forward(const int64_t* ctx, int64_t* out, int output_shift) const {
        int64_t x[64];
        int64_t y[64];
        for (int i = 0; i < dim; ++i) x[i] = ctx[i] << WEIGHT_SHIFT;

        int64_t stab[64];
        for (int o = 0; o < n_out; ++o) stab[o] = stab_b[o];
        for (int i = 0; i < dim; ++i) {
            int64_t xi = x[i];
            const int64_t* srow = stab_w.data() + size_t(i) * n_out;
            for (int o = 0; o < n_out; ++o) stab[o] += xi * srow[o];
        }

        for (int l = 0; l < n_trunk - 1; ++l) {
            const int64_t* w = weights[size_t(l)].data();
            const int64_t* b = biases[size_t(l)].data();
            for (int o = 0; o < dim; ++o) y[o] = b[o];
            for (int i = 0; i < dim; ++i) {
                int64_t xi = x[i];
                const int64_t* wrow = w + size_t(i) * dim;
                for (int o = 0; o < dim; ++o) y[o] += xi * wrow[o];
            }
            for (int o = 0; o < dim; ++o) {
                int64_t v = y[o] < 0 ? 0 : y[o];
                x[o] = v >> WEIGHT_SHIFT;
            }
        }

        const int64_t* w = weights[size_t(n_trunk - 1)].data();
        const int64_t* b = biases[size_t(n_trunk - 1)].data();
        for (int o = 0; o < n_out; ++o) y[o] = b[o] + stab[o];
        for (int i = 0; i < dim; ++i) {
            int64_t xi = x[i];
            const int64_t* wrow = w + size_t(i) * n_out;
            for (int o = 0; o < n_out; ++o) y[o] += xi * wrow[o];
        }
        for (int o = 0; o < n_out; ++o) out[o] = y[o] >> output_shift;
    }
};

constexpr int MASK = 9;       // MAX_ARM_MASK_SIZE
constexpr int PAD = (MASK - 1) / 2;

// Shared wavefront walk: calls fn(pos_in_padded_buffer) for every pixel in
// normative coding order (reference latent.py:63-146).
template <typename F>
void wavefront_walk(int h, int w, F&& fn) {
    int w_pad = w + 2 * PAD;
    if (w <= MASK) {  // no wavefront for very narrow grids: raster order
        for (int r = 0; r < h; ++r)
            for (int c = 0; c < w; ++c) fn((r + PAD) * w_pad + PAD + c);
        return;
    }
    int max_order = w - 1 + (h - 1) * (MASK + 1);
    for (int i = 0; i <= max_order; ++i) {
        int sy, sx;
        if (i < w) {
            sy = 0;
            sx = i;
        } else {
            sy = (i - w) / (MASK + 1) + 1;
            sx = w - (MASK + 1) + (i - w) % (MASK + 1);
        }
        for (int t = 0;; ++t) {
            int y = sy + t;
            int x = sx - (MASK + 1) * t;
            if (y >= h || x < 0) break;
            fn((y + PAD) * w_pad + PAD + x);
        }
    }
}

}  // namespace

extern "C" {

// ------------------------- tables -------------------------
void rc_set_tables(const float* mu_tab, int64_t n_mu, const float* sc_tab, int64_t n_sc) {
    g_mu_table.assign(mu_tab, mu_tab + n_mu);
    g_scale_table.assign(sc_tab, sc_tab + n_sc);
}

// ------------------------- raw symbol API -------------------------
void* rc_enc_new() { return new Encoder(); }
void rc_enc_free(void* e) { delete static_cast<Encoder*>(e); }

void rc_enc_encode_raw(void* e, const int32_t* sym, const double* mu, const double* sc,
                       int64_t n) {
    Encoder* enc = static_cast<Encoder*>(e);
    for (int64_t i = 0; i < n; ++i) {
        uint32_t left = left_cum(sym[i], mu[i], sc[i]);
        uint32_t prob = right_cum_minus_left(sym[i], mu[i], sc[i], left);
        enc->encode(left, prob);
    }
}

void rc_enc_encode_idx(void* e, const int32_t* sym, const int64_t* idx_mu,
                       const int64_t* idx_sc, int64_t n) {
    Encoder* enc = static_cast<Encoder*>(e);
    for (int64_t i = 0; i < n; ++i) {
        double mu, sc;
        lookup(idx_mu[i], idx_sc[i], &mu, &sc);
        uint32_t left = left_cum(sym[i], mu, sc);
        uint32_t prob = right_cum_minus_left(sym[i], mu, sc, left);
        enc->encode(left, prob);
    }
}

int64_t rc_enc_n_words_sealed(void* e) {
    // Seal a copy so the encoder can keep encoding afterwards.
    Encoder tmp = *static_cast<Encoder*>(e);
    tmp.seal();
    return int64_t(tmp.words.size());
}

void rc_enc_get_words_sealed(void* e, uint32_t* out) {
    Encoder tmp = *static_cast<Encoder*>(e);
    tmp.seal();
    std::memcpy(out, tmp.words.data(), tmp.words.size() * sizeof(uint32_t));
}

void* rc_dec_new(const uint32_t* words, int64_t n) {
    Decoder* d = new Decoder();
    d->init(words, n);
    return d;
}
void rc_dec_free(void* d) { delete static_cast<Decoder*>(d); }

void rc_dec_decode_raw(void* d, const double* mu, const double* sc, int64_t n, int32_t* out) {
    Decoder* dec = static_cast<Decoder*>(d);
    for (int64_t i = 0; i < n; ++i) out[i] = dec->decode(mu[i], sc[i]);
}

void rc_dec_decode_idx(void* d, const int64_t* idx_mu, const int64_t* idx_sc, int64_t n,
                       int32_t* out) {
    Decoder* dec = static_cast<Decoder*>(d);
    for (int64_t i = 0; i < n; ++i) {
        double mu, sc;
        lookup(idx_mu[i], idx_sc[i], &mu, &sc);
        out[i] = dec->decode(mu, sc);
    }
}

// ------------------------- full-grid wavefront codec -------------------------
//
// weights: concatenation of all trunk layer weight matrices, each [in, out]
//          row-major (pre-transposed for x @ W), in layer order; dims gives
//          (in, out) per layer. stab_w is [dim, 2] row-major.
// ifce_ctx: [h * w, n_ifce] int64 (X.8 fixed point) in raster order, or null.
// data: encode -> int64[h * w] input latents (raster order, in [-64, 63]);
//       decode -> int64[h * w] output buffer.
//
// Returns 0 on success.
static void build_arm(ArmFixedPoint& arm, int dim, int n_out, int n_trunk,
                      const int64_t* weights, const int64_t* biases,
                      const int64_t* stab_w, const int64_t* stab_b) {
    arm.dim = dim;
    arm.n_out = n_out;
    arm.n_trunk = n_trunk;
    arm.weights.resize(size_t(n_trunk));
    arm.biases.resize(size_t(n_trunk));
    const int64_t* wp = weights;
    const int64_t* bp = biases;
    for (int l = 0; l < n_trunk; ++l) {
        int out = (l == n_trunk - 1) ? n_out : dim;
        arm.weights[size_t(l)].assign(wp, wp + size_t(dim) * out);
        wp += size_t(dim) * out;
        arm.biases[size_t(l)].assign(bp, bp + out);
        bp += out;
    }
    arm.stab_w.assign(stab_w, stab_w + size_t(dim) * n_out);
    arm.stab_b.assign(stab_b, stab_b + n_out);
}

// Batched fixed-point ARM forward (used for the IFCE context computation,
// where numpy's int64 matmul has no fast path).
int32_t rc_arm_forward(const int64_t* x, int64_t n, int32_t n_spatial_plus_ifce,
                       int32_t n_trunk, const int64_t* weights, const int64_t* biases,
                       const int64_t* stab_w, const int64_t* stab_b,
                       int32_t n_out, int32_t output_shift, int64_t* out) {
    int dim = n_spatial_plus_ifce;
    if (dim > 64 || n_out > 64) return -1;
    ArmFixedPoint arm;
    build_arm(arm, dim, n_out, n_trunk, weights, biases, stab_w, stab_b);
    for (int64_t i = 0; i < n; ++i) {
        arm.forward(x + size_t(i) * dim, out + size_t(i) * n_out, output_shift);
    }
    return 0;
}

int32_t rc_code_grid(void* coder, int32_t is_encode, int32_t h, int32_t w,
                     int32_t n_spatial_ctx, int32_t n_ifce_ctx, const int64_t* ifce_ctx,
                     int32_t n_trunk, const int64_t* weights, const int64_t* biases,
                     const int64_t* stab_w, const int64_t* stab_b,
                     const int32_t* ctx_flat_idx,  // [n_spatial_ctx] 9x9 indices
                     int64_t* data) {
    int dim = n_spatial_ctx + n_ifce_ctx;
    if (dim > 64) return -1;

    ArmFixedPoint arm;
    build_arm(arm, dim, 2, n_trunk, weights, biases, stab_w, stab_b);

    int w_pad = w + 2 * PAD;
    int h_pad = h + 2 * PAD;
    std::vector<int64_t> buf(size_t(w_pad) * h_pad, 0);

    // 1-D offsets of the spatial context pixels in the padded buffer.
    int offs[64];
    for (int k = 0; k < n_spatial_ctx; ++k) {
        int idx = ctx_flat_idx[k];
        int dy = idx / MASK - PAD;
        int dx = idx % MASK - PAD;
        offs[k] = dy * w_pad + dx;
    }

    Encoder* enc = is_encode ? static_cast<Encoder*>(coder) : nullptr;
    Decoder* dec = is_encode ? nullptr : static_cast<Decoder*>(coder);
    int64_t n_mu = int64_t(g_mu_table.size());

    int err = 0;
    wavefront_walk(h, w, [&](int pos) {
        if (err) return;
        int64_t ctx[64];
        for (int k = 0; k < n_spatial_ctx; ++k) ctx[k] = buf[size_t(pos + offs[k])];
        if (n_ifce_ctx > 0) {
            int y = pos / w_pad - PAD;
            int x = pos % w_pad - PAD;
            const int64_t* row = ifce_ctx + (size_t(y) * w + x) * n_ifce_ctx;
            for (int k = 0; k < n_ifce_ctx; ++k) ctx[n_spatial_ctx + k] = row[k];
        }
        int64_t out2[2];
        arm.forward(ctx, out2, OUTPUT_SHIFT);

        int64_t idx_mu = out2[0] - MU_MIN_FP;
        if (idx_mu < 0) idx_mu = 0;
        if (idx_mu >= n_mu) idx_mu = n_mu - 1;
        int mu_fp = int(idx_mu) + int(MU_MIN_FP);
        double mu = double(g_mu_table[size_t(idx_mu)]);
        ScaleExpTable* t = g_scale_cache.get(out2[1] - LOG_SCALE_MIN_FP);

        int y = pos / w_pad - PAD;
        int x = pos % w_pad - PAD;
        uint32_t left, prob;
        int s;
        if (is_encode) {
            int64_t sv = data[size_t(y) * w + x];
            if (sv < SYM_MIN || sv > SYM_MAX) {
                err = -2;
                return;
            }
            s = int(sv);
            if (t != nullptr) {
                left = left_cum_tab(s, mu_fp, t);
                prob = right_cum_minus_left_tab(s, mu_fp, t, left);
            } else {
                double sc;
                lookup(idx_mu, out2[1] - LOG_SCALE_MIN_FP, &mu, &sc);
                left = left_cum(s, mu, sc);
                prob = right_cum_minus_left(s, mu, sc, left);
            }
            enc->encode(left, prob);
        } else {
            uint64_t scale64 = dec->range >> PRECISION;
            uint32_t quantile = dec->quantile();
            if (t != nullptr) {
                s = invert_quantile_tab(quantile, mu, mu_fp, t);
                left = left_cum_tab(s, mu_fp, t);
                prob = right_cum_minus_left_tab(s, mu_fp, t, left);
            } else {
                double sc;
                lookup(idx_mu, out2[1] - LOG_SCALE_MIN_FP, &mu, &sc);
                s = invert_quantile(quantile, mu, sc);
                left = left_cum(s, mu, sc);
                prob = right_cum_minus_left(s, mu, sc, left);
            }
            dec->advance(scale64, left, prob);
        }
        buf[size_t(pos)] = s;
        if (!is_encode) data[size_t(y) * w + x] = s;
    });
    return err;
}

}  // extern "C"
