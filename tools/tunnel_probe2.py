"""Measure the tunnel governor's burst budget and idle-recovery time.

One fused dispatch per burst (BENCH_CHUNK windows), idle IDLE_S seconds
between bursts. If every dispatch is fast, IDLE_S fully restores the budget.

Usage: IDLE_S=60 BENCH_CHUNK=4 N_BURSTS=5 python tools/tunnel_probe2.py
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
    c = CONFIGS[os.environ.get("BENCH_CONFIG", "1")]
    window = 16
    chunk = int(os.environ.get("BENCH_CHUNK", "4"))
    idle_s = float(os.environ.get("IDLE_S", "60"))
    n_bursts = int(os.environ.get("N_BURSTS", "5"))

    frames = _load_frames(1 + n_bursts * chunk * window, c["res"])
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
    for i, dc in enumerate(dchunks[:n_bursts]):
        if i:
            time.sleep(idle_s)
        t0 = time.perf_counter()
        out = compiled(st, dc, *args)
        st = out[0]
        jax.block_until_ready(st.canvas)
        dt = time.perf_counter() - t0
        print(f"burst {i}: {dt*1e3:8.1f} ms  ({fpc/dt:7.1f} fps)  idle={idle_s}s",
              flush=True)


if __name__ == "__main__":
    main()
