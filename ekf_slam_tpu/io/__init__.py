from ekf_slam_tpu.io.sequence import (ImageSequence, load_pgm,
                                      build_native, native_available)

__all__ = ["ImageSequence", "load_pgm", "build_native", "native_available"]
