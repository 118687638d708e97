"""Run the fountain-11 end-to-end accuracy gate on the REAL TPU chip
(pytest's conftest forces a virtual CPU mesh; this driver runs the same
gate on the default axon/TPU platform in f32).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import test_fountain11 as t  # noqa: E402


def main():
    t0 = time.perf_counter()
    t.test_fountain11_incremental()
    print(f"fountain11 TPU gate PASSED in "
          f"{time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
