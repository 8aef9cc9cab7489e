/* Native entropy kernels: CABAC arithmetic engine + residual_coding
 * bin-stream generation.
 *
 * The runtime analog of the reference's hand-optimized entropy hot path
 * (x265 source/encoder/entropy.cpp encodeBin/codeCoeffNxN + the
 * scanPosLast/costCoeffNxN asm primitives): the TPU framework keeps
 * analysis/recon on-chip, and this C layer removes the host-side Python
 * cost of phase-1 (syntax -> bins) and phase-2 (bins -> bytes).
 *
 * Bit-exact contract: mirrors entropy/cabac.py (CabacEncoder) and
 * entropy/residual.py (encode_residual) exactly; parity enforced by
 * tests/test_native_entropy.py.
 */
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define CTX_BYPASS (-1)
#define CTX_TERM (-2)

/* ---------------------------------------------------------------- engine */

typedef struct {
    uint32_t low_hi;      /* we keep low in 64-bit to match python ints */
    uint64_t low;
    uint32_t range;
    int32_t bits_left;
    int32_t num_buffered;
    uint32_t buffered_byte;
    uint8_t *out;
    long out_len;
} Cabac;

static void put_byte(Cabac *c, uint32_t b) { c->out[c->out_len++] = (uint8_t)(b & 0xFF); }

static void write_out(Cabac *c)
{
    uint32_t lead = (uint32_t)(c->low >> (13 + c->bits_left));
    c->low &= (1ULL << (13 + c->bits_left)) - 1;
    c->bits_left -= 8;
    if (lead == 0xFF) {
        c->num_buffered++;
    } else {
        if (c->num_buffered > 0) {
            uint32_t carry = lead >> 8;
            put_byte(c, c->buffered_byte + carry);
            for (int i = 0; i < c->num_buffered - 1; i++)
                put_byte(c, 0xFF + carry);
        }
        c->num_buffered = 1;
        c->buffered_byte = lead & 0xFF;
    }
}

static void encode_bin(Cabac *c, int bin, uint8_t *state,
                       const uint8_t *lps_table, const uint8_t *next_state)
{
    uint32_t s = *state;
    *state = next_state[2 * s + bin];
    uint32_t rng = c->range;
    uint32_t lps = lps_table[4 * (s >> 1) + ((rng >> 6) & 3)];
    rng -= lps;
    if ((bin ^ (int)s) & 1) {
        int num_bits = 0;
        uint32_t v = lps;
        while (v) { num_bits++; v >>= 1; }
        num_bits = 9 - num_bits;
        c->low = (c->low + rng) << num_bits;
        c->range = lps << num_bits;
        c->bits_left += num_bits;
    } else {
        int shift = rng < 256 ? 1 : 0;
        c->low <<= shift;
        c->range = rng << shift;
        c->bits_left += shift;
    }
    if (c->bits_left >= 0)
        write_out(c);
}

static void encode_bin_ep(Cabac *c, int bin)
{
    c->low = (c->low << 1) + (bin ? c->range : 0);
    c->bits_left += 1;
    if (c->bits_left >= 0)
        write_out(c);
}

static void encode_bin_trm(Cabac *c, int bin)
{
    c->range -= 2;
    if (bin) {
        c->low = (c->low + c->range) << 7;
        c->range = 2 << 7;
        c->bits_left += 7;
    } else if (c->range >= 256) {
        return;
    } else {
        c->low <<= 1;
        c->range <<= 1;
        c->bits_left += 1;
    }
    if (c->bits_left >= 0)
        write_out(c);
}

/* Encode a bin-IR stream; returns output byte count.  tail[0]/tail[1] =
 * the final partial-bit value/count to append after the bytes (the
 * python side writes them into its BitWriter before rbsp trailing). */
long cabac_encode(const uint8_t *bins, const int32_t *ctx, long n,
                  uint8_t *states, const uint8_t *lps_table,
                  const uint8_t *next_state, uint8_t *out, int64_t *tail)
{
    Cabac c;
    memset(&c, 0, sizeof(c));
    c.range = 510;
    c.bits_left = -12;
    c.buffered_byte = 0xFF;
    c.out = out;
    c.out_len = 0;
    for (long i = 0; i < n; i++) {
        int32_t cx = ctx[i];
        int b = bins[i];
        if (cx == CTX_BYPASS)
            encode_bin_ep(&c, b);
        else if (cx == CTX_TERM)
            encode_bin_trm(&c, b);
        else
            encode_bin(&c, b, &states[cx], lps_table, next_state);
    }
    /* finish (mirrors CabacEncoder.finish) */
    if (c.low >> (21 + c.bits_left)) {
        put_byte(&c, c.buffered_byte + 1);
        for (int i = 0; i < c.num_buffered - 1; i++)
            put_byte(&c, 0x00);
        c.low -= 1ULL << (21 + c.bits_left);
    } else {
        if (c.num_buffered > 0)
            put_byte(&c, c.buffered_byte);
        for (int i = 0; i < c.num_buffered - 1; i++)
            put_byte(&c, 0xFF);
    }
    int nbits = 13 + c.bits_left;
    tail[0] = (int64_t)(c.low >> 8);
    tail[1] = nbits;
    return c.out_len;
}

/* Advance context states over a bin-IR without arithmetic coding (WPP
 * context-sync computation: the state after CTU 1 of a row seeds the row
 * below, reference entropy ctx save/restore frameencoder.cpp:1666). */
void advance_states(const uint8_t *bins, const int32_t *ctx, long n,
                    uint8_t *states, const uint8_t *next_state)
{
    for (long i = 0; i < n; i++) {
        int32_t c = ctx[i];
        if (c >= 0)
            states[c] = next_state[2 * states[c] + bins[i]];
    }
}

/* ------------------------------------------------- residual bin-stream */

typedef struct {
    uint8_t *bins;
    int32_t *ctx;
    long n;
} IR;

static void cbin(IR *ir, int b, int32_t c) { ir->bins[ir->n] = (uint8_t)b; ir->ctx[ir->n++] = c; }
static void bypass(IR *ir, int b) { cbin(ir, b, CTX_BYPASS); }
static void bypass_bits(IR *ir, uint32_t v, int n)
{
    for (int k = n - 1; k >= 0; k--)
        bypass(ir, (v >> k) & 1);
}

static const int32_t CTX_IDX_MAP_4x4[16] =
    {0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8};

static int group_idx(int pos)
{
    if (pos < 4) return pos;
    int k = 31 - __builtin_clz((unsigned)pos);
    return 2 * k + ((pos >> (k - 1)) & 1);
}

static int min_in_group(int g)
{
    if (g < 4) return g;
    return (2 + (g & 1)) << ((g >> 1) - 1);
}

/* offsets array layout (from contexts.OFF, passed by python):
 * [0]=SIG_CG [1]=SIG [2]=LAST_X [3]=LAST_Y [4]=ONE [5]=ABS */
enum { O_SIG_CG, O_SIG, O_LAST_X, O_LAST_Y, O_ONE, O_ABS };

static void write_last_prefix(IR *ir, int pos, int log2_tb, int c_idx,
                              int base_ctx)
{
    int g = group_idx(pos);
    int ctx_offset, ctx_shift;
    if (c_idx == 0) {
        ctx_offset = 3 * (log2_tb - 2) + ((log2_tb - 1) >> 2);
        ctx_shift = (log2_tb + 1) >> 2;
    } else {
        ctx_offset = 15;
        ctx_shift = log2_tb - 2;
    }
    int cmax = (log2_tb << 1) - 1;
    for (int b = 0; b < g; b++)
        cbin(ir, 1, base_ctx + ctx_offset + (b >> ctx_shift));
    if (g < cmax)
        cbin(ir, 0, base_ctx + ctx_offset + (g >> ctx_shift));
}

static int sig_ctx(int xc, int yc, int cgx, int cgy, const uint8_t *cg_map,
                   int cg_grid, int log2_tb, int c_idx, int scan_idx,
                   const int32_t *off)
{
    int base = off[O_SIG] + (c_idx ? 27 : 0);
    if (log2_tb == 2)
        return base + CTX_IDX_MAP_4x4[(yc << 2) + xc];
    if (xc == 0 && yc == 0)
        return base;
    int right = (cgx + 1 < cg_grid) ? cg_map[cgy * cg_grid + cgx + 1] : 0;
    int below = (cgy + 1 < cg_grid) ? cg_map[(cgy + 1) * cg_grid + cgx] : 0;
    int prev = (right ? 1 : 0) | (below ? 2 : 0);
    int xp = xc & 3, yp = yc & 3;
    int s;
    switch (prev) {
    case 0: s = (xp + yp == 0) ? 2 : (xp + yp < 3) ? 1 : 0; break;
    case 1: s = (yp == 0) ? 2 : (yp == 1) ? 1 : 0; break;
    case 2: s = (xp == 0) ? 2 : (xp == 1) ? 1 : 0; break;
    default: s = 2;
    }
    if (c_idx == 0 && (cgx || cgy))
        s += 3;
    if (log2_tb == 3)
        s += (c_idx == 0) ? ((scan_idx == 0) ? 9 : 15) : 9;
    else
        s += (c_idx == 0) ? 21 : 12;
    return base + s;
}

static void write_remaining(IR *ir, int value, int rice)
{
    if (value < (3 << rice)) {
        int length = value >> rice;
        for (int i = 0; i < length; i++)
            bypass(ir, 1);
        bypass(ir, 0);
        bypass_bits(ir, value & ((1 << rice) - 1), rice);
    } else {
        int length = rice;
        value -= 3 << rice;
        while (value >= (1 << length)) {
            value -= 1 << length;
            length++;
        }
        int nb = 3 + length + 1 - rice;
        bypass_bits(ir, (1u << nb) - 2, nb);
        bypass_bits(ir, (uint32_t)value, length);
    }
}

/* Append the residual_coding bins of one TB.
 * level:   n*n raster int32
 * scan_xy: (n*n, 2) x,y pairs in scan order
 * cg_xy:   (ncg, 2)
 * Returns the number of bins appended. */
long enc_residual(const int32_t *level, int log2_tb, int c_idx,
                  int scan_idx, int sign_hide, const int32_t *scan_xy,
                  const int32_t *cg_xy, const int32_t *off,
                  uint8_t *bins_out, int32_t *ctx_out)
{
    IR ir = {bins_out, ctx_out, 0};
    int n = 1 << log2_tb;
    int ncoef = n * n;
    int32_t lev_scan[1024];
    int last_scan_pos = -1;
    for (int i = 0; i < ncoef; i++) {
        int x = scan_xy[2 * i], y = scan_xy[2 * i + 1];
        lev_scan[i] = level[y * n + x];
        if (lev_scan[i])
            last_scan_pos = i;
    }
    if (last_scan_pos < 0)
        return 0; /* caller checks cbf */
    int lx = scan_xy[2 * last_scan_pos];
    int ly = scan_xy[2 * last_scan_pos + 1];
    if (scan_idx == 2) { int t = lx; lx = ly; ly = t; }
    write_last_prefix(&ir, lx, log2_tb, c_idx, off[O_LAST_X]);
    write_last_prefix(&ir, ly, log2_tb, c_idx, off[O_LAST_Y]);
    int gg[2] = {lx, ly};
    for (int i = 0; i < 2; i++) {
        int g = group_idx(gg[i]);
        if (g > 3)
            bypass_bits(&ir, (uint32_t)(gg[i] - min_in_group(g)),
                        (g >> 1) - 1);
    }

    int last_cg = last_scan_pos >> 4;
    int cg_grid = (n >> 2) > 0 ? (n >> 2) : 1;
    uint8_t cg_map[64];
    memset(cg_map, 0, sizeof(cg_map));
    int c1 = 1;
    for (int i = last_cg; i >= 0; i--) {
        int cgx = cg_xy[2 * i], cgy = cg_xy[2 * i + 1];
        int infer_dc_sig = 0;
        int cg_has = 0;
        for (int p = 0; p < 16; p++)
            if (lev_scan[i * 16 + p]) { cg_has = 1; break; }
        if (i == last_cg || i == 0) {
            cg_map[cgy * cg_grid + cgx] = 1;
        } else {
            int right = (cgx + 1 < cg_grid) ? cg_map[cgy * cg_grid + cgx + 1] : 0;
            int below = (cgy + 1 < cg_grid) ? cg_map[(cgy + 1) * cg_grid + cgx] : 0;
            int cx = off[O_SIG_CG] + (c_idx ? 2 : 0) + ((right || below) ? 1 : 0);
            cbin(&ir, cg_has, cx);
            infer_dc_sig = cg_has;
            cg_map[cgy * cg_grid + cgx] = (uint8_t)cg_has;
            if (!cg_has)
                continue;
        }
        const int32_t *in_cg = &lev_scan[i * 16];
        int last_pos_in_cg = (i < last_cg) ? 15 : (last_scan_pos - i * 16);

        int sig_positions[16];
        int num_nz = 0;
        int sig_coded_one = 0;
        for (int p = last_pos_in_cg; p >= 0; p--) {
            int is_last = (i == last_cg && p == last_pos_in_cg);
            int sig = in_cg[p] != 0;
            if (is_last) {
                sig_positions[num_nz++] = p;
                sig_coded_one = 1;
                continue;
            }
            if (p == 0 && infer_dc_sig && !sig_coded_one) {
                sig_positions[num_nz++] = p;
                break;
            }
            int xc = scan_xy[2 * (i * 16 + p)];
            int yc = scan_xy[2 * (i * 16 + p) + 1];
            cbin(&ir, sig, sig_ctx(xc, yc, cgx, cgy, cg_map, cg_grid,
                                   log2_tb, c_idx, scan_idx, off));
            if (sig) {
                sig_positions[num_nz++] = p;
                sig_coded_one = 1;
            }
        }
        if (num_nz == 0)
            continue;
        int64_t abs_lv[16];
        int signs[16];
        for (int k = 0; k < num_nz; k++) {
            int32_t v = in_cg[sig_positions[k]];
            abs_lv[k] = v < 0 ? -(int64_t)v : v;
            signs[k] = v < 0;
        }
        int ctx_set = ((i > 0 && c_idx == 0) ? 2 : 0) + (c1 == 0 ? 1 : 0);
        c1 = 1;
        int g1_base = off[O_ONE] + (c_idx ? 16 : 0) + 4 * ctx_set;
        int first_g2 = -1;
        int num_g1 = num_nz < 8 ? num_nz : 8;
        for (int k = 0; k < num_g1; k++) {
            int flag = abs_lv[k] > 1;
            cbin(&ir, flag, g1_base + c1);
            if (flag) {
                c1 = 0;
                if (first_g2 == -1)
                    first_g2 = k;
            } else if (c1 > 0 && c1 < 3) {
                c1++;
            }
        }
        if (first_g2 != -1)
            cbin(&ir, abs_lv[first_g2] > 2,
                 off[O_ABS] + (c_idx ? 4 : 0) + ctx_set);

        int first_sig_scan = sig_positions[num_nz - 1];
        int last_sig_scan = sig_positions[0];
        int hidden = sign_hide && (last_sig_scan - first_sig_scan >= 4);
        int n_signs = hidden ? num_nz - 1 : num_nz;
        for (int k = 0; k < n_signs; k++)
            bypass(&ir, signs[k]);

        int rice = 0;
        for (int k = 0; k < num_nz; k++) {
            int base_level = 1;
            if (k < 8) {
                base_level = 2;
                if (k == first_g2)
                    base_level = 3;
            }
            if (abs_lv[k] >= base_level) {
                write_remaining(&ir, (int)(abs_lv[k] - base_level), rice);
                if (abs_lv[k] > (3 << rice))
                    rice = rice < 4 ? rice + 1 : 4;
            }
        }
    }
    return ir.n;
}

/* ---------------------------------------- slice-level merged residuals */

/* Merge a python-generated syntax bin-IR with deferred residual TUs in
 * ONE call (the "one native call per slice" entropy path: kills the
 * per-TU ctypes dispatch that dominated host time; analog of the
 * reference coding the whole CTU row inside Entropy::encodeCTU).
 *
 * py_bins/py_ctx: python syntax bins (n_py of them).
 * tu_desc: ntu * 6 int32: [pos_in_py_stream, lev_off, log2_tb, c_idx,
 *          scan_idx, sign_hide], pos non-decreasing.
 * levels:  staging buffer; TU t's raster levels at lev_off..+n*n.
 * scan_blob + scan_offs: scan_offs[(log2-2)*6 + scan*2 + {0,1}] are
 *          int32-element offsets of scan_xy / cg_xy in scan_blob.
 * tu_counts: out, per-TU appended bin counts (for WPP sync marks).
 * Returns total merged bin count. */
long merge_residual_ir(const uint8_t *py_bins, const int32_t *py_ctx,
                       long n_py, const int32_t *tu_desc, long ntu,
                       const int32_t *levels, const int32_t *scan_blob,
                       const int32_t *scan_offs, const int32_t *off,
                       uint8_t *out_bins, int32_t *out_ctx,
                       int32_t *tu_counts)
{
    long src = 0, dst = 0;
    for (long t = 0; t < ntu; t++) {
        const int32_t *d = &tu_desc[6 * t];
        long pos = d[0];
        long seg = pos - src;
        if (seg > 0) {
            memcpy(&out_bins[dst], &py_bins[src], (size_t)seg);
            memcpy(&out_ctx[dst], &py_ctx[src], (size_t)seg * 4);
            src += seg;
            dst += seg;
        }
        int log2_tb = d[2];
        int so = (log2_tb - 2) * 6 + d[4] * 2;
        long cnt = enc_residual(&levels[d[1]], log2_tb, d[3], d[4], d[5],
                                &scan_blob[scan_offs[so]],
                                &scan_blob[scan_offs[so + 1]], off,
                                &out_bins[dst], &out_ctx[dst]);
        tu_counts[t] = (int32_t)cnt;
        dst += cnt;
    }
    if (n_py > src) {
        memcpy(&out_bins[dst], &py_bins[src], (size_t)(n_py - src));
        memcpy(&out_ctx[dst], &py_ctx[src], (size_t)(n_py - src) * 4);
        dst += n_py - src;
    }
    return dst;
}
