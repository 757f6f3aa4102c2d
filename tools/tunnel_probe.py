"""Characterize the axon tunnel's duty-cycle governor.

Runs the config-1 fused clip step with per-chunk timing printed for every
dispatch, with an optional sleep between dispatches (TUNNEL_SLEEP seconds).
If the governor is a token bucket, sleeping between dispatches should restore
per-dispatch burst speed without improving sustained wall fps; if it's a
latch, the first post-sleep dispatch stays slow.

Usage: TUNNEL_SLEEP=1.0 BENCH_CHUNK=2 python tools/tunnel_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtvm_tpu.utils.platform import pin_and_cache

pin_and_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import CONFIGS, _load_frames
from rtvm_tpu.config import MosaicConfig
from rtvm_tpu.mosaic.stitcher import VideMosaic, make_clip_step


def main():
    c = CONFIGS[os.environ.get("BENCH_CONFIG", "1")]
    window = 16
    chunk = int(os.environ.get("BENCH_CHUNK", "2"))
    sleep_s = float(os.environ.get("TUNNEL_SLEEP", "0"))
    max_frames = int(os.environ.get("BENCH_FRAMES", "600"))

    frames = _load_frames(max_frames, c["res"])
    f0, rest = frames[0], frames[1:]
    n_windows = (len(rest) // window // chunk) * chunk
    windows = rest[: n_windows * window].reshape(
        n_windows // chunk, chunk, window, *rest.shape[1:]
    )

    int(jnp.int32(0))
    cfg = MosaicConfig(window_size=window)
    mosaic = VideMosaic(f0, detector_type=c["detector"], config=cfg)
    clip = make_clip_step(mosaic.frame_shape, mosaic.config, None)
    st = mosaic.state
    args = (mosaic._key, mosaic._fweight, mosaic._wtable)
    dchunks = [jax.device_put(jnp.asarray(wc, jnp.uint8)) for wc in windows]
    jax.block_until_ready(dchunks[-1])

    compiled = clip.lower(st, dchunks[0], *args).compile()
    fpc = chunk * window
    ts = []
    for i, dc in enumerate(dchunks):
        if sleep_s and i:
            time.sleep(sleep_s)
        t0 = time.perf_counter()
        out = compiled(st, dc, *args)
        st = out[0]
        jax.block_until_ready(st.canvas)
        dt = time.perf_counter() - t0
        ts.append(dt)
        print(f"chunk {i:2d}: {dt*1e3:8.1f} ms  ({fpc/dt:7.1f} fps)", flush=True)
    total = float(np.sum(ts))
    print(f"sustained: {len(ts)*fpc/total:.1f} fps over {total:.1f}s busy "
          f"(sleep {sleep_s}s between dispatches)")


if __name__ == "__main__":
    main()
