from ekf_slam_tpu.io.sequence import (ImageSequence, load_pgm, write_pgm,
                                      write_ppm, build_native,
                                      native_available)

__all__ = ["ImageSequence", "load_pgm", "write_pgm", "write_ppm",
           "build_native", "native_available"]
