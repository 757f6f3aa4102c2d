"""Test environment: force the JAX CPU backend with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md section 4)."""

import os

# NOTE: the environment pins JAX_PLATFORMS=axon globally, so the env var must be
# overwritten (not setdefault) AND jax.config must be updated before first use.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)


@pytest.fixture(scope="session")
def textured_image():
    """A reproducible richly-textured test image (blurred noise + shapes) that gives
    feature detectors something to find. Uses its own RandomState so content does
    not depend on test execution order."""
    import cv2

    rng = np.random.RandomState(987)
    img = rng.randint(0, 255, (320, 440, 3)).astype(np.uint8)
    img = cv2.GaussianBlur(img, (0, 0), 1.2)
    for _ in range(40):
        x, y = rng.randint(20, 420), rng.randint(20, 300)
        c = tuple(int(v) for v in rng.randint(0, 255, 3))
        if rng.rand() < 0.5:
            cv2.rectangle(img, (x, y), (x + rng.randint(8, 40), y + rng.randint(8, 40)), c, -1)
        else:
            cv2.circle(img, (x, y), rng.randint(4, 20), c, -1)
    return img
