"""Top-level encoder: frames in, Annex-B HEVC out.

Analog of x265's Encoder (source/encoder/encoder.cpp Encoder::encode) +
FrameEncoder pipeline, restructured for the TPU execution model:
  analysis (batched JAX)  ->  recon wavefront (batched JAX)  ->
  syntax IR (host numpy)  ->  CABAC serialization (host)  ->  NALs.

v1 scope: intra-only CQP, 4:2:0 8-bit, uniform 16x16 CUs in 32x32 CTUs,
deblock/SAO off.  Every frame is an IDR (keyint=1 semantics, matching
north-star config 1: BasketballPass intra QP32).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from ..params import EncoderParams
from ..bitstream.bitwriter import BitWriter
from ..bitstream.headers import (
    SLICE_I, SliceHeader, build_pps_info, build_sps_info, write_pps,
    write_slice_header, write_sps, write_vps)
from ..bitstream.nal import (
    NAL_IDR_W_RADL, NAL_PPS, NAL_SPS, NAL_SUFFIX_SEI, NAL_VPS, annexb)
from ..bitstream.sei import plane_md5, write_decoded_picture_hash
from ..entropy.binir import BinIR
from ..entropy.cabac import CabacEncoder
from ..entropy.contexts import init_states
from ..entropy.cu_syntax import CodedCU, SliceSyntaxEncoder
from ..analysis.intra_mode import decide_modes
from ..frame.recon_intra import IntraReconstructor


@dataclass
class EncodedFrame:
    poc: int
    bitstream: bytes              # Annex-B NALs of this AU
    recon: tuple                  # (y, u, v) uint8 planes
    bits: int = 0
    md5: bytes = b""


class Encoder:
    """x265_encoder_open/encode analog (reference api.cpp:75,423)."""

    def __init__(self, params: EncoderParams) -> None:
        self.p = params.validate()
        assert self.p.internal_csp == 1 and self.p.internal_bit_depth == 8, \
            "v1: 4:2:0 8-bit"
        self.sps = build_sps_info(self.p)
        self.pps = build_pps_info(self.p)
        # v1 restrictions: no WPP substreams, no SAO, no SBH
        self.pps.entropy_coding_sync = False
        self.pps.sign_hide = False
        self.pps.cu_qp_delta_enabled = False
        self.pps.deblocking_disabled = not self.p.deblock
        self.sps.sao_enabled = False
        self.recon = IntraReconstructor(self.sps, self.p.qp,
                                        self.p.cb_qp_offset,
                                        self.p.cr_qp_offset)
        if self.p.deblock:
            from ..ops.deblock import intra_bs_maps, chroma_on_maps
            bs_v, bs_h = intra_bs_maps(self.sps.width, self.sps.height, 16)
            on_v, on_h = chroma_on_maps(bs_v, bs_h, self.sps.height // 2,
                                        self.sps.width // 2)
            self._bs = tuple(np.asarray(a) for a in (bs_v, bs_h, on_v, on_h))
        self.frame_count = 0
        self._headers_sent = False

    # -- headers -------------------------------------------------------------
    def headers(self) -> bytes:
        return (annexb(NAL_VPS, write_vps(self.sps)) +
                annexb(NAL_SPS, write_sps(self.sps)) +
                annexb(NAL_PPS, write_pps(self.pps)))

    # -- per-frame -----------------------------------------------------------
    def encode_frame(self, y: np.ndarray, u: np.ndarray,
                     v: np.ndarray) -> EncodedFrame:
        sps, pps, p = self.sps, self.pps, self.p
        y, u, v = (self._pad(y, 0), self._pad(u, 1), self._pad(v, 1))

        modes = decide_modes(y, sps, block=16)
        r = self.recon.run(y, u, v, modes)

        slice_rbsp = self._encode_slice(modes, r)
        if p.deblock:
            # in-loop deblock post-pass (intra refs used pre-filter samples;
            # the output/hash picture is the filtered one)
            import jax.numpy as jnp
            from ..ops.deblock import deblock_frame_batch
            bs_v, bs_h, on_v, on_h = self._bs
            dy, du, dv = deblock_frame_batch(
                jnp.asarray(r["recon_y"].astype(np.int32)),
                jnp.asarray(r["recon_u"].astype(np.int32)),
                jnp.asarray(r["recon_v"].astype(np.int32)),
                jnp.asarray(bs_v), jnp.asarray(bs_h),
                jnp.asarray(on_v), jnp.asarray(on_h),
                p.qp, self.recon.qp_cb, self.recon.qp_cr,
                p.deblock_beta_offset, p.deblock_tc_offset)
            r["recon_y"] = np.asarray(dy).astype(np.uint8)
            r["recon_u"] = np.asarray(du).astype(np.uint8)
            r["recon_v"] = np.asarray(dv).astype(np.uint8)
        md5 = plane_md5(r["recon_y"], r["recon_u"], r["recon_v"])
        out = b""
        if not self._headers_sent or p.repeat_headers:
            out += self.headers()
            self._headers_sent = True
        out += annexb(NAL_IDR_W_RADL, slice_rbsp)
        if p.decoded_picture_hash:
            out += annexb(NAL_SUFFIX_SEI, write_decoded_picture_hash(md5))
        frame = EncodedFrame(self.frame_count, out,
                             (r["recon_y"], r["recon_u"], r["recon_v"]),
                             bits=len(out) * 8, md5=md5)
        self.frame_count += 1
        return frame

    def _pad(self, plane: np.ndarray, comp_shift: int) -> np.ndarray:
        """Pad a source plane to the coded (min-CU aligned) size by edge
        replication (reference PicYuv padding, picyuv.cpp)."""
        th = self.sps.height >> comp_shift
        tw = self.sps.width >> comp_shift
        h, w = plane.shape
        if (h, w) == (th, tw):
            return plane
        out = np.empty((th, tw), plane.dtype)
        out[:h, :w] = plane
        out[:h, w:] = plane[:, w - 1:w]
        out[h:, :] = out[h - 1:h, :]
        return out

    def _encode_slice(self, modes: np.ndarray, r: dict) -> bytes:
        sps, pps = self.sps, self.pps
        sh = SliceHeader(slice_type=SLICE_I, nal_type=NAL_IDR_W_RADL,
                         poc=0, qp=self.p.qp,
                         deblocking_disabled=pps.deblocking_disabled)
        bw = write_slice_header(sh, sps, pps)

        syn = SliceSyntaxEncoder(sps, pps, self.p.qp)
        ir = BinIR()
        n_ctu_x, n_ctu_y = sps.pic_width_in_ctus, sps.pic_height_in_ctus
        bpc = self.recon.bpc
        nbx, nby = self.recon.nbx, self.recon.nby
        for cy in range(n_ctu_y):
            for cx in range(n_ctu_x):
                cus: List[CodedCU] = []
                for zy in range(bpc):
                    for zx in range(bpc):
                        bx, by = cx * bpc + zx, cy * bpc + zy
                        if bx >= nbx or by >= nby:
                            continue
                        x0, y0 = bx * 16, by * 16
                        cu = CodedCU(x0, y0, 4,
                                     (int(modes[by, bx]),), 4)
                        for c_idx, key, clog2 in ((0, "lev_y", 4),
                                                  (1, "lev_u", 3),
                                                  (2, "lev_v", 3)):
                            lv = r[key][by, bx]
                            if np.any(lv):
                                cx0 = x0 >> (1 if c_idx else 0)
                                cy0 = y0 >> (1 if c_idx else 0)
                                cu.coeffs[(c_idx, cx0, cy0, clog2)] = lv
                        cus.append(cu)
                last = (cy == n_ctu_y - 1) and (cx == n_ctu_x - 1)
                syn.encode_ctu(ir, cus, cx, cy, last)

        states = init_states(SLICE_I, self.p.qp)
        cab = CabacEncoder(bw)
        bins, ctx = ir.arrays()
        cab.encode_stream(bins, ctx, states)
        cab.finish()
        bw.rbsp_trailing_bits()
        return bw.get_bytes()


def encode_sequence(params: EncoderParams, frames) -> tuple:
    """Convenience: encode an iterable of (y, u, v) frames.

    Returns (annexb bytestream, [EncodedFrame...])."""
    enc = Encoder(params)
    stream = b""
    encoded = []
    for (y, u, v) in frames:
        f = enc.encode_frame(y, u, v)
        stream += f.bitstream
        encoded.append(f)
    return stream, encoded
