"""Measure the tunnel governor's latch-recovery time.

Assumes the governor is currently latched (run after a throttled workload).
Samples ONE single-window dispatch (~50 ms device time at full speed) after
exponentially growing idle gaps; prints per-sample blocked time. The sample
itself is small enough not to drain a recovered bucket, but if the latch is
keyed on "recent activity" frequent sampling would hold it latched — hence
exponential gaps.

Usage: GAPS_MIN=2,4,8,16 python tools/tunnel_probe3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtvm_tpu.utils.platform import pin_and_cache

pin_and_cache()

import jax
import jax.numpy as jnp

from bench import CONFIGS, _load_frames
from rtvm_tpu.config import MosaicConfig
from rtvm_tpu.mosaic.stitcher import VideMosaic, make_clip_step


def main():
    c = CONFIGS["1"]
    window = 16
    gaps = [float(g) * 60 for g in os.environ.get("GAPS_MIN", "2,4,8,16").split(",")]

    frames = _load_frames(1 + (1 + len(gaps)) * window, c["res"])
    f0, rest = frames[0], frames[1:]
    n = len(rest) // window
    windows = rest[: n * window].reshape(n, 1, window, *rest.shape[1:])

    int(jnp.int32(0))
    cfg = MosaicConfig(window_size=window)
    mosaic = VideMosaic(f0, detector_type=c["detector"], config=cfg)
    clip = make_clip_step(mosaic.frame_shape, mosaic.config, None)
    st = mosaic.state
    args = (mosaic._key, mosaic._fweight, mosaic._wtable)
    dchunks = [jax.device_put(jnp.asarray(wc, jnp.uint8)) for wc in windows]
    jax.block_until_ready(dchunks[-1])
    compiled = clip.lower(st, dchunks[0], *args).compile()

    # immediate sample = the latched baseline
    for i, gap in enumerate([0.0] + gaps):
        if gap:
            time.sleep(gap)
        t0 = time.perf_counter()
        out = compiled(st, dchunks[i], *args)
        st = out[0]
        jax.block_until_ready(st.canvas)
        dt = time.perf_counter() - t0
        print(
            f"after {gap/60:5.1f} min idle: {dt*1e3:8.1f} ms ({window/dt:7.1f} fps)",
            flush=True,
        )


if __name__ == "__main__":
    main()
