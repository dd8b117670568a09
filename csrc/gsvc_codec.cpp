// GSVC-TPU host codec: rANS entropy coding + octree geometry coding.
//
// Replaces three native dependencies of the reference (SURVEY.md §2.2):
//   * gsvc_cuda_ans   — GPU rANS over a quantized-Gaussian symbol model
//                       (driven from utils/encodings.py:102-262)
//   * torchac         — CDF arithmetic coding of binary streams
//                       (utils/encodings.py:265-304)
//   * MPEG tmc3/G-PCC — lossless octree geometry coding of quantized
//                       anchors (utils/encodings.py:714-818)
//
// Design notes:
//   * bit-exactness: the Gaussian CDF is quantized identically on the
//     encode and decode side (same double-precision code path, single
//     threaded), so round-trips are exact by construction — the property
//     the reference only asserted in commented-out code.
//   * rANS: 64-bit state, 32-bit renormalization, 16-bit probabilities;
//     symbols encoded in reverse so decode streams forward.
//   * per-element distributions: every value has its own (mu, sigma) from
//     the hash-grid entropy network; the quantized CDF assigns every
//     symbol in [min_s, max_s] a frequency >= 1 by construction.
//   * geometry: breadth-first octree occupancy with a context-adaptive
//     binary range coder; duplicate points carried as leaf counts
//     (mergeDuplicatedPoints=0 parity with cfgs/lossless_encoder.cfg).
//
// Exposed as a flat C ABI consumed via ctypes (gsvc_tpu/codec/native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

// ---------------------------------------------------------------------------
// Quantized Gaussian CDF
// ---------------------------------------------------------------------------

constexpr int kProbBits = 16;
constexpr uint32_t kProbScale = 1u << kProbBits;

inline double norm_cdf(double x) {
    return 0.5 * std::erfc(-x * 0.7071067811865475244);
}

// Quantized CDF boundary k in [0, R]: strictly increasing, Q(0)=0,
// Q(R)=kProbScale, every symbol gets frequency >= 1.
struct GaussianCdf {
    double mu, sigma, g0, denom;
    int64_t min_s;
    int64_t range;

    GaussianCdf(double mu_, double sigma_, int64_t min_s_, int64_t max_s_)
        : mu(mu_), sigma(sigma_ > 1e-12 ? sigma_ : 1e-12), min_s(min_s_),
          range(max_s_ - min_s_ + 1) {
        g0 = norm_cdf((double(min_s) - 0.5 - mu) / sigma);
        double g1 = norm_cdf((double(min_s) + double(range) - 0.5 - mu)
                             / sigma);
        denom = g1 - g0;
    }

    uint32_t boundary(int64_t k) const {  // k in [0, range]
        if (k <= 0) return 0;
        if (k >= range) return kProbScale;
        double gk;
        if (denom < 1e-300) {
            gk = double(k) / double(range);
        } else {
            double g = norm_cdf((double(min_s) + double(k) - 0.5 - mu)
                                / sigma);
            gk = (g - g0) / denom;
            if (gk < 0.0) gk = 0.0;
            if (gk > 1.0) gk = 1.0;
        }
        uint64_t q = (uint64_t)std::llround(
            gk * double(kProbScale - (uint64_t)range));
        return (uint32_t)(q + (uint64_t)k);
    }

    void sym_range(int64_t sym, uint32_t* start, uint32_t* freq) const {
        int64_t k = sym - min_s;
        uint32_t lo = boundary(k);
        uint32_t hi = boundary(k + 1);
        *start = lo;
        *freq = hi - lo;
    }

    // find symbol whose [start, start+freq) contains cum — binary search
    // over the monotone boundary function
    int64_t find(uint32_t cum, uint32_t* start, uint32_t* freq) const {
        int64_t lo = 0, hi = range;  // boundary(lo) <= cum < boundary(hi)
        while (hi - lo > 1) {
            int64_t mid = (lo + hi) >> 1;
            if (boundary(mid) <= cum) lo = mid;
            else hi = mid;
        }
        uint32_t s = boundary(lo);
        uint32_t e = boundary(lo + 1);
        *start = s;
        *freq = e - s;
        return lo + min_s;
    }
};

// ---------------------------------------------------------------------------
// rANS (64-bit state, 32-bit words)
// ---------------------------------------------------------------------------

constexpr uint64_t kRansL = 1ull << 31;

struct RansEncoder {
    uint64_t state = kRansL;
    std::vector<uint32_t> words;  // emitted words (reversed at flush)

    void put(uint32_t start, uint32_t freq) {
        uint64_t x_max = ((kRansL >> kProbBits) << 32) * freq;
        if (state >= x_max) {
            words.push_back((uint32_t)state);
            state >>= 32;
        }
        state = ((state / freq) << kProbBits) + (state % freq) + start;
    }

    // bytes: [8B final state][words in reverse emission order]
    size_t flush(uint8_t* out, size_t cap) const {
        size_t need = 8 + words.size() * 4;
        if (out == nullptr) return need;
        if (cap < need) return (size_t)-1;
        std::memcpy(out, &state, 8);
        uint8_t* p = out + 8;
        for (size_t i = words.size(); i-- > 0;) {
            std::memcpy(p, &words[i], 4);
            p += 4;
        }
        return need;
    }
};

struct RansDecoder {
    uint64_t state = 0;
    const uint8_t* p;
    const uint8_t* end;

    RansDecoder(const uint8_t* buf, size_t n) : p(buf + 8), end(buf + n) {
        std::memcpy(&state, buf, 8);
    }

    uint32_t cum() const { return (uint32_t)(state & (kProbScale - 1)); }

    void advance(uint32_t start, uint32_t freq) {
        state = freq * (state >> kProbBits) + cum() - start;
        while (state < kRansL && p + 4 <= end) {
            uint32_t w;
            std::memcpy(&w, p, 4);
            p += 4;
            state = (state << 32) | w;
        }
    }
};

// ---------------------------------------------------------------------------
// Context-adaptive binary range coder (for octree geometry)
// ---------------------------------------------------------------------------

struct BinProb {
    uint16_t p1 = 1 << 14;  // P(bit=1) in 15-bit precision
    void update(int bit) {
        if (bit) p1 += (32768 - p1) >> 5;
        else p1 -= p1 >> 5;
        if (p1 < 32) p1 = 32;
        if (p1 > 32736) p1 = 32736;
    }
};

struct RangeEncoder {
    uint32_t low = 0, range_ = 0xFFFFFFFFu;
    std::vector<uint8_t> out;
    uint8_t cache = 0;
    uint64_t cache_size = 1;
    uint64_t low64 = 0;

    void shift_low() {
        if ((uint32_t)(low64 >> 32) != 0 || (uint32_t)(low64) < 0xFF000000u) {
            if (cache_size != (uint64_t)-1) {
                out.push_back((uint8_t)(cache + (low64 >> 32)));
                for (uint64_t i = 1; i < cache_size; i++)
                    out.push_back((uint8_t)(0xFF + (low64 >> 32)));
            }
            cache = (uint8_t)(low64 >> 24);
            cache_size = 0;
        }
        cache_size++;
        low64 = (low64 << 8) & 0xFFFFFFFFu;
    }

    void encode_bit(BinProb& m, int bit) {
        uint32_t bound = (range_ >> 15) * m.p1;
        if (bit) {
            range_ = bound;
        } else {
            low64 += bound;
            range_ -= bound;
        }
        m.update(bit);
        while (range_ < (1u << 24)) {
            range_ <<= 8;
            shift_low();
        }
    }

    void flush() {
        // keep the leading byte: a carry may propagate into it, and the
        // decoder's 5-byte preload shifts it out of the 32-bit window
        for (int i = 0; i < 5; i++) shift_low();
    }
};

struct RangeDecoder {
    uint32_t range_ = 0xFFFFFFFFu, code = 0;
    const uint8_t* p;
    const uint8_t* end;

    RangeDecoder(const uint8_t* buf, size_t n) : p(buf), end(buf + n) {
        for (int i = 0; i < 5; i++) code = (code << 8) | next();
    }
    uint8_t next() { return p < end ? *p++ : 0; }

    int decode_bit(BinProb& m) {
        uint32_t bound = (range_ >> 15) * m.p1;
        int bit;
        if (code < bound) {
            bit = 1;
            range_ = bound;
        } else {
            bit = 0;
            code -= bound;
            range_ -= bound;
        }
        m.update(bit);
        while (range_ < (1u << 24)) {
            range_ <<= 8;
            code = (code << 8) | next();
        }
        return bit;
    }
};

// Exp-Golomb-ish adaptive unsigned integer coding on top of the binary coder
void encode_uint(RangeEncoder& enc, std::vector<BinProb>& ctx, uint64_t v) {
    int nbits = 0;
    uint64_t tmp = v + 1;
    while (tmp > 1) { nbits++; tmp >>= 1; }
    for (int i = 0; i < nbits; i++) enc.encode_bit(ctx[std::min(i, 15)], 1);
    enc.encode_bit(ctx[std::min(nbits, 15)], 0);
    for (int i = nbits - 1; i >= 0; i--)
        enc.encode_bit(ctx[16 + std::min(i, 15)], ((v + 1) >> i) & 1);
}

uint64_t decode_uint(RangeDecoder& dec, std::vector<BinProb>& ctx) {
    int nbits = 0;
    while (dec.decode_bit(ctx[std::min(nbits, 15)])) nbits++;
    uint64_t v = 1;
    for (int i = nbits - 1; i >= 0; i--)
        v = (v << 1) | (uint64_t)dec.decode_bit(ctx[16 + std::min(i, 15)]);
    return v - 1;
}

}  // namespace

// ===========================================================================
// C ABI
// ===========================================================================

extern "C" {

// ---- Gaussian rANS --------------------------------------------------------

// Returns bytes written, or -1 on overflow / bad args.  Call with out=NULL
// is not supported; provide cap >= 16 + 8*n.
long long ans_encode_gaussian(const int32_t* syms, const double* mu,
                              const double* sigma, long long n,
                              long long min_s, long long max_s,
                              uint8_t* out, long long cap) {
    if (max_s <= min_s) return -1;
    RansEncoder enc;
    enc.words.reserve((size_t)n / 2 + 16);
    for (long long i = n - 1; i >= 0; i--) {
        if (syms[i] < min_s || syms[i] > max_s) return -2;
        GaussianCdf cdf(mu[i], sigma[i], min_s, max_s);
        uint32_t start, freq;
        cdf.sym_range(syms[i], &start, &freq);
        enc.put(start, freq);
    }
    size_t written = enc.flush(out, (size_t)cap);
    return written == (size_t)-1 ? -1 : (long long)written;
}

long long ans_decode_gaussian(const uint8_t* in, long long n_bytes,
                              const double* mu, const double* sigma,
                              long long n, long long min_s, long long max_s,
                              int32_t* out_syms) {
    if (n_bytes < 8) return -1;
    RansDecoder dec(in, (size_t)n_bytes);
    for (long long i = 0; i < n; i++) {
        GaussianCdf cdf(mu[i], sigma[i], min_s, max_s);
        uint32_t start, freq;
        int64_t sym = cdf.find(dec.cum(), &start, &freq);
        dec.advance(start, freq);
        out_syms[i] = (int32_t)sym;
    }
    return n;
}

// ---- Bernoulli rANS (binary streams with one global probability each) ----

long long ans_encode_binary(const uint8_t* bits, const double* p1,
                            long long n, uint8_t* out, long long cap) {
    RansEncoder enc;
    enc.words.reserve((size_t)n / 16 + 16);
    for (long long i = n - 1; i >= 0; i--) {
        double p = p1[i];
        if (p < 1e-6) p = 1e-6;
        if (p > 1.0 - 1e-6) p = 1.0 - 1e-6;
        uint32_t f1 = (uint32_t)std::llround(p * kProbScale);
        if (f1 < 1) f1 = 1;
        if (f1 > kProbScale - 1) f1 = kProbScale - 1;
        uint32_t f0 = kProbScale - f1;
        if (bits[i]) enc.put(f0, f1);  // symbol 1 occupies [f0, 2^16)
        else enc.put(0, f0);
    }
    size_t written = enc.flush(out, (size_t)cap);
    return written == (size_t)-1 ? -1 : (long long)written;
}

long long ans_decode_binary(const uint8_t* in, long long n_bytes,
                            const double* p1, long long n,
                            uint8_t* out_bits) {
    if (n_bytes < 8) return -1;
    RansDecoder dec(in, (size_t)n_bytes);
    for (long long i = 0; i < n; i++) {
        double p = p1[i];
        if (p < 1e-6) p = 1e-6;
        if (p > 1.0 - 1e-6) p = 1.0 - 1e-6;
        uint32_t f1 = (uint32_t)std::llround(p * kProbScale);
        if (f1 < 1) f1 = 1;
        if (f1 > kProbScale - 1) f1 = kProbScale - 1;
        uint32_t f0 = kProbScale - f1;
        uint32_t c = dec.cum();
        if (c < f0) {
            out_bits[i] = 0;
            dec.advance(0, f0);
        } else {
            out_bits[i] = 1;
            dec.advance(f0, f1);
        }
    }
    return n;
}

// ---- Octree geometry coder (G-PCC replacement) ---------------------------

// Encode n points of depth-`depth` quantized coords (uint32 per axis,
// interleaved [x0,y0,z0,x1,...]).  The DECODER emits points in Morton
// (bit-interleaved BFS) order with duplicates consecutive — callers align
// attribute streams with the permutation from `octree_sort_indices`.
long long octree_encode(const uint32_t* xyz, long long n, int depth,
                        uint8_t* out, long long cap) {
    // build morton codes and sort
    struct P { uint64_t code; uint32_t x, y, z; };
    std::vector<P> pts((size_t)n);
    for (long long i = 0; i < n; i++) {
        uint32_t x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
        uint64_t code = 0;
        for (int b = depth - 1; b >= 0; b--) {
            code = (code << 3) | (((x >> b) & 1) << 2) | (((y >> b) & 1) << 1)
                 | ((z >> b) & 1);
        }
        pts[(size_t)i] = {code, x, y, z};
    }
    std::sort(pts.begin(), pts.end(),
              [](const P& a, const P& b) { return a.code < b.code; });

    RangeEncoder enc;
    std::vector<BinProb> occ_ctx((size_t)depth * 8 * 2);
    std::vector<BinProb> cnt_ctx(32);

    // BFS by levels over [begin, end) ranges of the sorted array
    struct Node { size_t lo, hi; };
    std::vector<Node> level = {{0, (size_t)n}};
    for (int l = 0; l < depth; l++) {
        int shift = 3 * (depth - 1 - l);
        std::vector<Node> next;
        next.reserve(level.size() * 2);
        for (const Node& nd : level) {
            // children ranges by 3-bit digit at this level
            size_t lo = nd.lo;
            uint8_t occupancy = 0;
            size_t child_lo[8], child_hi[8];
            for (int c = 0; c < 8; c++) {
                size_t hi = lo;
                while (hi < nd.hi &&
                       (int)((pts[hi].code >> shift) & 7) == c) hi++;
                child_lo[c] = lo;
                child_hi[c] = hi;
                if (hi > lo) occupancy |= (1 << c);
                lo = hi;
            }
            // context: level, bit index, plus "any previous sibling coded 1"
            int prev = 0;
            for (int c = 0; c < 8; c++) {
                int bit = (occupancy >> c) & 1;
                size_t ctx = ((size_t)l * 8 + (size_t)c) * 2 + (size_t)prev;
                enc.encode_bit(occ_ctx[ctx], bit);
                prev = bit ? 1 : prev;
                if (bit) next.push_back({child_lo[c], child_hi[c]});
            }
        }
        level.swap(next);
    }
    // leaf duplicate counts
    for (const Node& nd : level)
        encode_uint(enc, cnt_ctx, (uint64_t)(nd.hi - nd.lo - 1));

    enc.flush();
    if ((long long)enc.out.size() > cap) return -1;
    std::memcpy(out, enc.out.data(), enc.out.size());
    return (long long)enc.out.size();
}

// Decodes up to n points into xyz_out (interleaved), Morton order,
// duplicates consecutive.  Returns number of points decoded.
long long octree_decode(const uint8_t* in, long long n_bytes, long long n,
                        int depth, uint32_t* xyz_out) {
    RangeDecoder dec(in, (size_t)n_bytes);
    std::vector<BinProb> occ_ctx((size_t)depth * 8 * 2);
    std::vector<BinProb> cnt_ctx(32);

    struct Node { uint32_t x, y, z; };
    std::vector<Node> level = {{0, 0, 0}};
    for (int l = 0; l < depth; l++) {
        std::vector<Node> next;
        next.reserve(level.size() * 2);
        for (const Node& nd : level) {
            int prev = 0;
            for (int c = 0; c < 8; c++) {
                size_t ctx = ((size_t)l * 8 + (size_t)c) * 2 + (size_t)prev;
                int bit = dec.decode_bit(occ_ctx[ctx]);
                prev = bit ? 1 : prev;
                if (bit) {
                    next.push_back({(nd.x << 1) | (uint32_t)((c >> 2) & 1),
                                    (nd.y << 1) | (uint32_t)((c >> 1) & 1),
                                    (nd.z << 1) | (uint32_t)(c & 1)});
                }
            }
        }
        level.swap(next);
    }
    long long out_i = 0;
    for (const Node& nd : level) {
        uint64_t extra = decode_uint(dec, cnt_ctx);
        for (uint64_t r = 0; r <= extra && out_i < n; r++) {
            xyz_out[3 * out_i] = nd.x;
            xyz_out[3 * out_i + 1] = nd.y;
            xyz_out[3 * out_i + 2] = nd.z;
            out_i++;
        }
    }
    return out_i;
}

// Stable argsort of points by Morton code: selection[i] = original index of
// the i-th decoder-order point (the attribute alignment permutation, the
// analog of the reference's double-sort at utils/encodings.py:789-809).
void octree_sort_indices(const uint32_t* xyz, long long n, int depth,
                         long long* selection) {
    std::vector<std::pair<uint64_t, long long>> keyed((size_t)n);
    for (long long i = 0; i < n; i++) {
        uint32_t x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
        uint64_t code = 0;
        for (int b = depth - 1; b >= 0; b--) {
            code = (code << 3) | (((x >> b) & 1) << 2) | (((y >> b) & 1) << 1)
                 | ((z >> b) & 1);
        }
        keyed[(size_t)i] = {code, i};
    }
    std::stable_sort(keyed.begin(), keyed.end(),
                     [](const auto& a, const auto& b) {
                         return a.first < b.first;
                     });
    for (long long i = 0; i < n; i++) selection[i] = keyed[(size_t)i].second;
}

}  // extern "C"
