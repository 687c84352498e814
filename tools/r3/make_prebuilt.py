"""Package a persistent-cache directory into repo-shipped prebuilt
executables (prebuilt/xla/*.gz) - see utils/cache._sync_prebuilt.

Usage (stage into a FRESH dir so the package holds exactly the
executables the current code compiles; a long-lived cache dir
accumulates dead keys from older code):

    export TPU_RAY_CACHE_DIR=/tmp/prebuilt_stage TPU_RAY_PREBUILT=0
    python bench.py --prewarm --suite two-spheres,cornell,cornell-smoke,next-week --no-validate
    python tools/validate_hw.py --render
    python tools/r3/make_prebuilt.py /tmp/prebuilt_stage

Only TPU entries are packaged: XLA:CPU cache entries embed the compile
host's machine features (avx512 etc.) and loading them on a different
host warns "could lead to execution errors such as SIGILL" - and the
driver's bench runs on the TPU backend anyway.  CPU entries are detected
by their embedded feature strings in the zstd-decoded payload; anything
undecodable is kept (fail-open: a mismatched key is dead weight, not
wrong results).
"""
import gzip
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


# Feature strings XLA:CPU embeds for the compile host's ISA; any of these
# in the decoded payload marks a CPU-host entry (covers x86 avx/sse, ARM
# neon/sve - ADVICE r3: '+avx' alone missed ARM staging hosts).
_CPU_MARKERS = (b"prefer-no-gather", b"+avx", b"+sse", b"+neon", b"+sve",
                b"cpu_features")


def is_cpu_entry(path: str) -> bool:
    try:
        import zstandard
    except ImportError:
        return False  # fail-open
    try:
        raw = open(path, "rb").read()
        body = zstandard.ZstdDecompressor().decompress(
            raw, max_output_size=1 << 28)
    except Exception:
        return False
    return any(m in body for m in _CPU_MARKERS)


def write_platform_record(dst_parent: str) -> None:
    """Record the producing jax + normalized backend version so a
    mismatched consumer environment can warn instead of silently missing
    (utils/cache.prebuilt_platform_mismatch)."""
    try:
        import jax
        import jax.extend

        sys.path.insert(0, REPO)
        from tpu_ray.utils.cache import normalized_platform_version

        record = "\n".join([
            jax.version._version,
            normalized_platform_version(
                jax.extend.backend.get_backend().platform_version),
        ]).strip()
        # provenance line (NOT part of the mismatch comparison): Pallas
        # kernel keys embed the nearest tpu_ray call-site LINE NUMBERS
        # (utils/cache.py traceback note), so entries staged before a
        # tpu_ray source edit can structurally miss afterwards - record
        # which code staged them so that failure mode is attributable.
        try:
            import subprocess
            sha = subprocess.run(
                ["git", "-C", REPO, "describe", "--always", "--dirty"],
                capture_output=True, text=True, timeout=10).stdout.strip()
            if sha:
                record += f"\ncode {sha}"
        except Exception:
            pass
    except Exception as e:
        print(f"PLATFORM.txt not written (no backend?): {e}")
        return
    path = os.path.join(dst_parent, "PLATFORM.txt")
    with open(path, "w") as f:
        f.write(record + "\n")
    print(f"recorded producing platform in {path}")


def package(src: str, dst: str) -> tuple[int, int]:
    """Gzip every TPU cache entry in src into dst; returns (n, n_cpu)."""
    os.makedirs(dst, exist_ok=True)
    total_in = total_out = n = n_cpu = 0
    for name in sorted(os.listdir(src)):
        p = os.path.join(src, name)
        if not os.path.isfile(p):
            continue
        if is_cpu_entry(p):
            n_cpu += 1
            continue
        out = os.path.join(dst, name + ".gz")
        with open(p, "rb") as f_in, \
                gzip.open(out, "wb", compresslevel=9) as f_out:
            shutil.copyfileobj(f_in, f_out)
        total_in += os.path.getsize(p)
        total_out += os.path.getsize(out)
        n += 1
    print(f"packaged {n} TPU entries ({n_cpu} CPU-host entries skipped): "
          f"{total_in/1e6:.1f} MB -> {total_out/1e6:.1f} MB in {dst}")
    return n, n_cpu


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.expanduser("~"), ".cache", "tpu_ray", "xla")
    dst = os.path.join(REPO, "prebuilt", "xla")
    if os.path.isdir(dst):  # stale keys are dead weight; replace wholesale
        shutil.rmtree(dst)
    package(src, dst)
    write_platform_record(os.path.join(REPO, "prebuilt"))
