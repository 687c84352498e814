"""Package a persistent-cache directory into repo-shipped prebuilt
executables (prebuilt/xla/*.gz) - see utils/cache._sync_prebuilt.

Usage:
    TPU_RAY_CACHE_DIR=/tmp/prebuilt_stage python bench.py --prewarm
    TPU_RAY_CACHE_DIR=/tmp/prebuilt_stage python tools/validate_hw.py --render
    python tools/r3/make_prebuilt.py /tmp/prebuilt_stage

Stage into a FRESH cache dir so the package holds exactly the executables
the current code compiles (a long-lived cache dir accumulates entries from
older code whose keys are dead weight).
"""
import gzip
import os
import shutil
import sys

src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.expanduser("~"), ".cache", "tpu_ray", "xla")
dst = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "prebuilt", "xla")
os.makedirs(dst, exist_ok=True)
total_in = total_out = n = 0
for name in sorted(os.listdir(src)):
    p = os.path.join(src, name)
    if not os.path.isfile(p):
        continue
    out = os.path.join(dst, name + ".gz")
    with open(p, "rb") as f_in, gzip.open(out, "wb", compresslevel=9) as f_out:
        shutil.copyfileobj(f_in, f_out)
    total_in += os.path.getsize(p)
    total_out += os.path.getsize(out)
    n += 1
print(f"packaged {n} entries: {total_in/1e6:.1f} MB -> {total_out/1e6:.1f} MB "
      f"in {dst}")
