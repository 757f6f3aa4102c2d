"""Bisect the SIFT patch-extraction slowdown: time _extract_level_patches
with different gauss_mid producers, scan-amortized (see profile_fused.py).

    python tools/probe_patches.py [R]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VIDEO = "/root/reference/Data/поиски квадрокоптера 2 (360p) 01.mp4"


def main(R=8):
    import cv2
    import jax
    import jax.numpy as jnp

    from rtvm_tpu.utils.platform import pin_and_cache

    pin_and_cache()

    from rtvm_tpu.ops import color
    from rtvm_tpu.ops.features import sift as SF
    from rtvm_tpu.ops.filters import gaussian_blur

    cap = cv2.VideoCapture(VIDEO)
    _, f0 = cap.read()
    frames = np.stack([cap.read()[1] for _ in range(16)])
    cap.release()
    dwin = jnp.asarray(frames)
    grays = jax.jit(lambda fr: jax.vmap(color.bgr2gray)(fr))(dwin)
    jax.block_until_ready(grays)
    B, H, W = grays.shape
    S = 3
    Q = 373
    rng = np.random.default_rng(0)
    xy = jnp.asarray(
        np.stack(
            [rng.uniform(20, W - 20, (B, Q)), rng.uniform(20, H - 20, (B, Q))], axis=-1
        ).astype(np.float32)
    )
    lvl = jnp.asarray(rng.integers(1, S + 1, (B, Q)).astype(np.int32))

    def timed(name, fn, reps=R):
        def body(c, _):
            eps = (c * 1e-30).astype(jnp.float32)
            out = fn(eps)
            leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
            return sum(jnp.mean(l.astype(jnp.float32)) for l in leaves), None

        f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=reps)[0])
        jax.block_until_ready(f(jnp.float32(0.0)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(jnp.float32(0.0)))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - 0.030) / reps
        print(f"{name:34s} {per*1e3:8.2f} ms/window ({per*1e3/16:6.3f} ms/frame)  "
              f"[dispatch {min(ts)*1e3:.0f} ms / {reps} reps]", flush=True)

    sigma0 = 1.6
    kfac = 2.0 ** (1.0 / S)
    sigmas = np.array([sigma0 * kfac ** l for l in range(S + 3)], dtype=np.float32)
    deltas = np.sqrt(np.maximum(sigmas ** 2 - sigmas[0] ** 2, 0.0))

    def extract(gm, eps):
        return jax.vmap(SF._extract_level_patches)(gm + eps, xy, lvl)

    # A) producer = jit argument (clean default layout)
    garg = jax.jit(
        lambda g: jax.vmap(lambda x: SF._octave_levels(gaussian_blur(x / 255.0, 1.2), deltas))(g)
    )(grays)[:, 1 : S + 1]
    garg = jax.device_put(np.asarray(garg))
    jax.block_until_ready(garg)
    timed("A: from argument", lambda eps: extract(garg, eps))

    # B) producer = current pyramid, octave 0, in-graph
    def mk_b(eps):
        def one(g):
            base = gaussian_blur(g / 255.0 + eps, 1.2)
            gauss = SF._octave_levels(base, deltas)
            return gauss[1 : S + 1]

        return extract(jax.vmap(one)(grays), jnp.float32(0.0))

    timed("B: from blocked pyramid", mk_b)

    # C) producer = dense-banded pyramid (round-2 version), in-graph
    def mk_c(eps):
        def one(g):
            base = gaussian_blur(g / 255.0 + eps, 1.2)
            Bx, By = SF._band_matrices(tuple(round(float(d), 6) for d in deltas), H, W)
            x = jnp.einsum("hw,lwW->lhW", base, jnp.asarray(Bx),
                           precision=jax.lax.Precision.HIGH)
            gauss = jnp.einsum("lhH,lHw->lhw", jnp.asarray(By), x,
                               precision=jax.lax.Precision.HIGH)
            return gauss[1 : S + 1]

        return extract(jax.vmap(one)(grays), jnp.float32(0.0))

    timed("C: from dense-banded pyramid", mk_c)

    # D) producer = blocked pyramid + detect in graph too (mimics real fn)
    def mk_d(eps):
        def one(g):
            base = gaussian_blur(g / 255.0 + eps, 1.2)
            gauss = SF._octave_levels(base, deltas)
            dogs = gauss[1:] - gauss[:-1]
            xy1, lvl1, _, _ = SF._detect_octave(dogs, Q, 0.009, 10.0, 16)
            return gauss[1 : S + 1], xy1, lvl1

        gm, xy1, lvl1 = jax.vmap(one)(grays)
        return jax.vmap(SF._extract_level_patches)(gm, xy1, lvl1)

    timed("D: blocked pyr + real detect xy", mk_d)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
