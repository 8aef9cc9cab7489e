"""Multi-stream batch encode sharded over a device mesh.

The P9/P10 strategies from SURVEY.md §2.3 made real: S independent
streams (or GOP segments of one long stream) advance in lockstep, with
the heavy per-frame device programs — batched mode decision and the fused
recon wavefront — executed once over an (S, ...) stacked batch whose
leading axis is sharded across the mesh (GSPMD partitions the existing
vmapped programs; no per-device loops).  Host entropy runs per stream on
the CPU afterwards, exactly like the reference keeps CABAC on dedicated
threads while workers fill rows (threading.rst).

This is the production scale-out path the driver's dryrun validates on a
virtual device mesh.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import EncoderParams, default_params
from ..encoder.top import Encoder, EncodedFrame
from ..analysis.intra_mode import decide_modes_batch
from .mesh import make_mesh


class MultiStreamEncoder:
    """General multi-stream encoder: S independent P/B streams, each
    pinned to its own mesh device (P9 made real beyond all-intra —
    the reference runs one frame-encoder pool per stream; here each
    stream's analysis + wavefront programs dispatch on its device
    while host entropy of the other streams overlaps in threads).

    Streams are fully independent encoders (own headers, RC, DPB,
    lookahead); encode_step advances every stream by one source frame
    and returns each stream's newly emitted frames.  Output is
    byte-identical to running each Encoder standalone."""

    def __init__(self, params: EncoderParams, n_streams: int,
                 mesh: Mesh = None) -> None:
        self.n = n_streams
        if mesh is not None:
            self.devices = list(mesh.devices.flat)
        else:
            self.devices = list(jax.local_devices())
        import copy
        self.encoders = []
        for _ in range(n_streams):
            p = copy.deepcopy(params)
            self.encoders.append(Encoder(p))

    def _advance(self, i: int, frame):
        enc = self.encoders[i]
        dev = self.devices[i % len(self.devices)]
        with jax.default_device(dev):
            if frame is None:
                return enc.flush()
            return enc.encode_frame(*frame)

    def encode_step(self, frames: Sequence) -> List[List[EncodedFrame]]:
        """frames: one (y, u, v) per stream (None = flush that stream).
        Returns the per-stream lists of emitted frames."""
        assert len(frames) == self.n
        import concurrent.futures as cf
        with cf.ThreadPoolExecutor(max_workers=self.n) as ex:
            return list(ex.map(lambda iv: self._advance(*iv),
                               enumerate(frames)))

    def flush(self) -> List[List[EncodedFrame]]:
        return self.encode_step([None] * self.n)


class MultiStreamIntraEncoder:
    """All-intra lockstep encoder for S streams sharded over a mesh.

    Each stream keeps its own Encoder (headers, RC, entropy state); the
    mode-decision + wavefront compute for all streams' current frames is
    one sharded device program.
    """

    def __init__(self, params: EncoderParams, n_streams: int,
                 mesh: Mesh = None) -> None:
        assert params.keyframe_max == 1, "multi-stream v1 is all-intra"
        self.n = n_streams
        self.mesh = mesh if mesh is not None else make_mesh(
            n_streams, "stream")
        self.encoders = [Encoder(default_params(
            params.source_width, params.source_height, qp=params.qp,
            keyframe_max=1, sao=params.sao, deblock=params.deblock,
            wpp=params.wpp, ctu_size=params.ctu_size,
            # the batched wavefront is the fixed-grid (rd-2) analysis;
            # pin it so headers match a rd-2 streaming encoder
            rd_level=min(params.rd_level, 2)))
            for _ in range(n_streams)]
        self.sharding = NamedSharding(self.mesh, P("stream"))

    def encode_step(self, frames: Sequence[tuple]) -> List[EncodedFrame]:
        """frames: one (y, u, v) per stream.  Returns one EncodedFrame per
        stream (same order)."""
        assert len(frames) == self.n
        enc0 = self.encoders[0]
        padded = [(e._pad(y, 0), e._pad(u, 1), e._pad(v, 1))
                  for e, (y, u, v) in zip(self.encoders, frames)]
        ys = np.stack([f[0] for f in padded])
        us = np.stack([f[1] for f in padded])
        vs = np.stack([f[2] for f in padded])
        qp = enc0.rc.frame_qp("I", 0.0)      # CQP: stateless

        # device phase: stream-sharded batched mode decision + wavefront
        ys_d = jax.device_put(ys.astype(np.int32), self.sharding)
        modes = decide_modes_batch(ys_d, enc0.sps, block=16, qp=qp)
        results = enc0.recon.run_batch(ys_d, us, vs, modes, qp=qp)

        # host phase: per-stream filters + entropy via each Encoder
        out: List[EncodedFrame] = []
        for i, enc in enumerate(self.encoders):
            r = results[i]
            inter_mask = np.zeros(modes[i].shape, bool)
            mvs = np.zeros(modes[i].shape + (2,), np.int32)
            enc._deblock(r, inter_mask, mvs, None, None, ((), ()),
                         qp, enc.recon)
            sao_maps = enc._sao(r, ys[i], us[i], vs[i], qp) \
                if enc.p.sao else None
            rbsp = enc._encode_slice(modes[i], inter_mask, mvs, None,
                                     None, r, "I", 0, qp, ((), ()),
                                     sao_maps)
            from ..bitstream.nal import NAL_IDR_W_RADL, NAL_SUFFIX_SEI, annexb
            from ..bitstream.sei import plane_md5, write_decoded_picture_hash
            md5 = plane_md5(r["recon_y"], r["recon_u"], r["recon_v"],
                            bit_depth=enc.sps.bit_depth)
            nal_bytes = b""
            if not enc._headers_sent:
                nal_bytes += enc.headers()
                enc._headers_sent = True
            nal_bytes += annexb(NAL_IDR_W_RADL, rbsp)
            if enc.p.decoded_picture_hash:
                nal_bytes += annexb(NAL_SUFFIX_SEI,
                                    write_decoded_picture_hash(md5))
            out.append(EncodedFrame(
                0, nal_bytes, (r["recon_y"], r["recon_u"], r["recon_v"]),
                bits=len(nal_bytes) * 8, md5=md5, slice_type="I"))
        return out
