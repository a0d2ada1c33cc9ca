"""TPU-native compute ops: DSP front-ends, image ops, Pallas kernels."""

from . import dsp_ref, frontend, image  # noqa: F401
