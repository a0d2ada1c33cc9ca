"""Native host-library tests: build, load, and numeric parity of every
entry point against the numpy reference implementations."""

import numpy as np
import pytest

from l3embedding_tpu import native
from l3embedding_tpu.ops import image as I


@pytest.fixture(scope="module")
def lib_available():
    return native.available()


def test_builds_and_loads(lib_available):
    # g++ is in the image, so the library must build.
    assert lib_available


def test_pcm16_to_float():
    x = np.array([-32768, -1, 0, 1, 32767], dtype=np.int16)
    out = native.pcm16_to_float(x)
    np.testing.assert_allclose(
        out, x.astype(np.float32) / 32768.0, rtol=0, atol=0
    )
    assert out.dtype == np.float32


def test_u8_to_pm1():
    x = np.arange(256, dtype=np.uint8)
    out = native.u8_to_pm1(x)
    np.testing.assert_allclose(
        out, 2.0 * (x.astype(np.float32) / 255.0) - 1.0, atol=1e-6
    )


def test_gain_i16():
    rng = np.random.RandomState(0)
    x = (rng.randn(48000) * 8000).astype(np.int16)
    for gain in (0.9, 1.0, 1.1):
        out = native.gain_i16(x, gain)
        # Clamping semantics (numpy astype would wrap on overflow; the
        # sample factory's gain bound prevents clipping in practice,
        # reference sample.py:149-157).
        expected = np.clip(
            x.astype(np.float64) * gain, -32768, 32767
        ).astype(np.int16)
        np.testing.assert_array_equal(out, expected)


def test_augment_frame_matches_numpy(lib_available):
    rng = np.random.RandomState(1)
    frame = rng.randint(0, 256, size=(32, 48, 3)).astype(np.uint8)
    for flip in (False, True):
        for sat_first in (False, True):
            got = native.augment_frame(frame, flip, 1.3, 0.05, sat_first)
            # numpy reference chain (what the fallback and the reference
            # pipeline compute)
            f = I.img_as_float(frame)
            if flip:
                f = I.horiz_flip(f)
            if sat_first:
                f = I.adjust_saturation(f, 1.3)
                f = I.adjust_brightness(f, 0.05)
            else:
                f = I.adjust_brightness(f, 0.05)
                f = I.adjust_saturation(f, 1.3)
            want = I.img_as_ubyte(f)
            assert got.shape == want.shape
            diff = np.abs(got.astype(int) - want.astype(int))
            # identical up to 1 LSB of uint8 rounding
            assert diff.max() <= 1
            assert (diff > 0).mean() < 0.02


def test_augment_identity():
    frame = np.full((8, 8, 3), 128, np.uint8)
    out = native.augment_frame(frame, False, 1.0, 0.0, True)
    np.testing.assert_array_equal(out, frame)


def test_resize_nn():
    rng = np.random.RandomState(2)
    frame = rng.randint(0, 256, size=(64, 96, 3)).astype(np.uint8)
    out = native.resize_nn(frame, 32, 48)
    assert out.shape == (32, 48, 3)
    yi = np.minimum(63, np.arange(32) * 64 // 32)
    xi = np.minimum(95, np.arange(48) * 96 // 48)
    np.testing.assert_array_equal(out, frame[yi][:, xi])
