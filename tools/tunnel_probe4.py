"""Does the governor key on BLOCKED dispatches or device duty?

Enqueues the WHOLE clip as back-to-back async chunk dispatches (state chains
on-device via donation) and blocks ONCE at the end. If the tunnel governor
throttles blocked RPCs, this runs at device speed and the wall-clock from
first enqueue to final block is the honest full-clip number. If it throttles
device duty, the wall matches the throttled per-chunk protocol.

Usage: BENCH_CONFIG=1 BENCH_CHUNK=2 python tools/tunnel_probe4.py
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
    chunk = int(os.environ.get("BENCH_CHUNK", "2"))
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

    n_frames = n_windows * window
    t0 = time.perf_counter()
    enq = []
    for dc in dchunks:
        out = compiled(st, dc, *args)
        st = out[0]
        enq.append(time.perf_counter() - t0)
    t_enq = time.perf_counter() - t0
    jax.block_until_ready(st.canvas)
    dt = time.perf_counter() - t0
    print(f"async-all: {n_frames} frames, enqueue {t_enq*1e3:.0f} ms, "
          f"total {dt*1e3:.0f} ms -> {n_frames/dt:.1f} fps", flush=True)
    print("enqueue timeline (ms):", [round(e * 1e3) for e in enq[:10]], "...",
          flush=True)


if __name__ == "__main__":
    main()
