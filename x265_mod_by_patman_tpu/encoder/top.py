"""Top-level encoder: frames in, Annex-B HEVC out.

Analog of x265's Encoder (source/encoder/encoder.cpp Encoder::encode) +
FrameEncoder pipeline + DPB (source/encoder/dpb.cpp), restructured for
the TPU execution model:
  analysis (batched JAX)  ->  recon wavefront (batched JAX)  ->
  syntax IR (host numpy)  ->  CABAC serialization (host)  ->  NALs.

v1 scope: 4:2:0 8-bit, uniform 16x16 CUs in 32x32 CTUs, CQP.
GOP: IDR + IPPP with a single reference (keyframe_max controls the IDR
interval; keyframe_max == 1 -> all-intra, north-star config 1).
Deblock in-loop; SAO/WPP/SBH off.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..params import EncoderParams
from ..bitstream.bitwriter import BitWriter
from ..bitstream.headers import (
    SLICE_I, SLICE_P, SliceHeader, build_pps_info, build_sps_info,
    write_pps, write_slice_header, write_sps, write_vps)
from ..bitstream.nal import (
    NAL_IDR_W_RADL, NAL_PPS, NAL_SPS, NAL_SUFFIX_SEI, NAL_TRAIL_R, NAL_VPS,
    annexb)
from ..bitstream.sei import plane_md5, write_decoded_picture_hash
from ..entropy.binir import BinIR
from ..entropy.cabac import CabacEncoder, encode_ir_to_writer
from ..entropy.contexts import init_states
from ..entropy.cu_syntax import CodedCU, SliceSyntaxEncoder
from ..analysis.intra_mode import decide_modes
from ..analysis.inter_mode import analyse_p_frame
from ..frame.recon_intra import IntraReconstructor
from ..ops.deblock import (
    chroma_on_maps, deblock_frame_batch, inter_bs_maps, intra_bs_maps)

MAX_MERGE = 3


@dataclass
class EncodedFrame:
    poc: int
    bitstream: bytes              # Annex-B NALs of this AU
    recon: tuple                  # (y, u, v) uint8 planes
    bits: int = 0
    md5: bytes = b""
    slice_type: str = "I"


class Encoder:
    """x265_encoder_open/encode analog (reference api.cpp:75,423)."""

    def __init__(self, params: EncoderParams) -> None:
        self.p = params.validate()
        assert self.p.internal_csp == 1 and self.p.internal_bit_depth == 8, \
            "v1: 4:2:0 8-bit"
        self.sps = build_sps_info(self.p)
        self.pps = build_pps_info(self.p)
        # v1 restrictions: no WPP substreams, no SAO, no SBH, no TMVP
        self.pps.entropy_coding_sync = False
        self.pps.sign_hide = False
        self.pps.cu_qp_delta_enabled = False
        self.pps.deblocking_disabled = not self.p.deblock
        self.sps.sao_enabled = False
        self.sps.temporal_mvp = False
        self.recon = IntraReconstructor(self.sps, self.p.qp,
                                        self.p.cb_qp_offset,
                                        self.p.cr_qp_offset)
        self.frame_count = 0
        self.poc = 0
        self._headers_sent = False
        self._ref: Optional[tuple] = None      # (y, u, v) uint8 recon

    # -- headers -------------------------------------------------------------
    def headers(self) -> bytes:
        return (annexb(NAL_VPS, write_vps(self.sps)) +
                annexb(NAL_SPS, write_sps(self.sps)) +
                annexb(NAL_PPS, write_pps(self.pps)))

    # -- per-frame -----------------------------------------------------------
    def encode_frame(self, y: np.ndarray, u: np.ndarray,
                     v: np.ndarray) -> EncodedFrame:
        p = self.p
        y, u, v = (self._pad(y, 0), self._pad(u, 1), self._pad(v, 1))
        is_idr = (self.frame_count % max(1, p.keyframe_max) == 0) or \
            self._ref is None

        if is_idr:
            self.poc = 0
            modes = decide_modes(y, self.sps, block=16)
            r = self.recon.run(y, u, v, modes)
            inter_mask = np.zeros(modes.shape, bool)
            mvs = np.zeros(modes.shape + (2,), np.int32)
        else:
            modes, inter_mask, mvs, mc = analyse_p_frame(
                y, u, v, *self._ref, self.sps, p.qp,
                search_range=min(p.search_range, 24))
            r = self.recon.run(y, u, v, modes, mc, inter_mask)

        slice_rbsp = self._encode_slice(modes, inter_mask, mvs, r, is_idr)
        self._deblock(r, inter_mask, mvs)
        md5 = plane_md5(r["recon_y"], r["recon_u"], r["recon_v"])

        out = b""
        if not self._headers_sent or (p.repeat_headers and is_idr):
            out += self.headers()
            self._headers_sent = True
        out += annexb(NAL_IDR_W_RADL if is_idr else NAL_TRAIL_R, slice_rbsp)
        if p.decoded_picture_hash:
            out += annexb(NAL_SUFFIX_SEI, write_decoded_picture_hash(md5))
        frame = EncodedFrame(self.poc, out,
                             (r["recon_y"], r["recon_u"], r["recon_v"]),
                             bits=len(out) * 8, md5=md5,
                             slice_type="I" if is_idr else "P")
        self._ref = frame.recon if p.keyframe_max != 1 else None
        self.frame_count += 1
        self.poc += 1
        return frame

    def _deblock(self, r: dict, inter_mask, mvs) -> None:
        if not self.p.deblock:
            return
        p = self.p
        w, h = self.sps.width, self.sps.height
        if inter_mask.any():
            cbf = np.array([[bool(np.any(r["lev_y"][by, bx]))
                             for bx in range(self.recon.nbx)]
                            for by in range(self.recon.nby)])
            bs_v, bs_h = inter_bs_maps(~inter_mask, mvs, cbf, w, h, 16)
        else:
            bs_v, bs_h = intra_bs_maps(w, h, 16)
        on_v, on_h = chroma_on_maps(bs_v, bs_h, h // 2, w // 2)
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

    def _encode_slice(self, modes, inter_mask, mvs, r: dict,
                      is_idr: bool) -> bytes:
        sps, pps = self.sps, self.pps
        slice_type = SLICE_I if is_idr else SLICE_P
        sh = SliceHeader(slice_type=slice_type,
                         nal_type=NAL_IDR_W_RADL if is_idr else NAL_TRAIL_R,
                         poc=self.poc, qp=self.p.qp,
                         deblocking_disabled=pps.deblocking_disabled,
                         five_minus_max_num_merge_cand=5 - MAX_MERGE)
        if not is_idr:
            sh.num_ref_idx = (1, 0)
            sh.st_rps_neg = ((-1, True),)
        bw = write_slice_header(sh, sps, pps)

        syn = SliceSyntaxEncoder(sps, pps, self.p.qp, slice_type,
                                 MAX_MERGE, num_refs=1)
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
                        if inter_mask[by, bx]:
                            cu = CodedCU(x0, y0, 4, (1,), 4, {},
                                         is_inter=True,
                                         mv=(int(mvs[by, bx, 0]),
                                             int(mvs[by, bx, 1])),
                                         ref_idx=0)
                        else:
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

        states = init_states(slice_type, self.p.qp)
        bins, ctx = ir.arrays()
        encode_ir_to_writer(bw, bins, ctx, states)
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
