"""Prebuilt executable cache sync (utils/cache._sync_prebuilt).

The reference compiles once at build time (GHC, stack.yaml:52-55); our
equivalent build artifact is prebuilt/xla/ - gzipped persistent-cache
entries unpacked into the live cache dir on enable_compilation_cache().
These tests pin the sync semantics: gz entries unpack byte-identically,
existing cache entries are never clobbered, non-gz files are ignored,
and TPU_RAY_PREBUILT=0 disables the whole mechanism.
"""
import gzip
import os

from tpu_ray.utils.cache import _sync_prebuilt


def _make_prebuilt(tmp_path, entries):
    pre = tmp_path / "prebuilt"
    pre.mkdir()
    for name, payload in entries.items():
        with gzip.open(pre / (name + ".gz"), "wb") as f:
            f.write(payload)
    return str(pre)


def test_sync_unpacks_byte_identical(tmp_path):
    payload = os.urandom(4096)
    pre = _make_prebuilt(tmp_path, {"entry_a": payload, "entry_b": b"x" * 10})
    cache = tmp_path / "cache"
    cache.mkdir()
    n = _sync_prebuilt(str(cache), pre)
    assert n == 2
    assert (cache / "entry_a").read_bytes() == payload
    assert (cache / "entry_b").read_bytes() == b"x" * 10
    # no .tmp leftovers
    assert sorted(p.name for p in cache.iterdir()) == ["entry_a", "entry_b"]


def test_sync_never_clobbers_existing(tmp_path):
    pre = _make_prebuilt(tmp_path, {"entry_a": b"prebuilt-bytes"})
    cache = tmp_path / "cache"
    cache.mkdir()
    (cache / "entry_a").write_bytes(b"live-entry")
    n = _sync_prebuilt(str(cache), pre)
    assert n == 0
    assert (cache / "entry_a").read_bytes() == b"live-entry"


def test_sync_is_idempotent(tmp_path):
    pre = _make_prebuilt(tmp_path, {"entry_a": b"payload"})
    cache = tmp_path / "cache"
    cache.mkdir()
    assert _sync_prebuilt(str(cache), pre) == 1
    assert _sync_prebuilt(str(cache), pre) == 0
    assert (cache / "entry_a").read_bytes() == b"payload"


def test_sync_ignores_non_gz(tmp_path):
    pre = tmp_path / "prebuilt"
    pre.mkdir()
    (pre / "README.txt").write_bytes(b"not a cache entry")
    cache = tmp_path / "cache"
    cache.mkdir()
    assert _sync_prebuilt(str(cache), str(pre)) == 0
    assert list(cache.iterdir()) == []


def test_sync_missing_dir_is_noop(tmp_path):
    cache = tmp_path / "cache"
    cache.mkdir()
    assert _sync_prebuilt(str(cache), str(tmp_path / "nope")) == 0


def test_sync_disabled_by_env(tmp_path, monkeypatch):
    pre = _make_prebuilt(tmp_path, {"entry_a": b"payload"})
    cache = tmp_path / "cache"
    cache.mkdir()
    monkeypatch.setenv("TPU_RAY_PREBUILT", "0")
    assert _sync_prebuilt(str(cache), pre) == 0
    assert list(cache.iterdir()) == []


def _load_packager():
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "r3", "make_prebuilt.py")
    spec = importlib.util.spec_from_file_location("make_prebuilt", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_packager_skips_cpu_host_entries(tmp_path, capsys):
    """The packager ships TPU executables only: XLA:CPU entries embed the
    compile host's CPU features and can SIGILL elsewhere."""
    import zstandard

    mp = _load_packager()
    src = tmp_path / "stage"
    src.mkdir()
    comp = zstandard.ZstdCompressor()
    (src / "cpu_entry").write_bytes(
        comp.compress(b"xla cpu executable +avx512f features"))
    (src / "tpu_entry").write_bytes(
        comp.compress(b"mosaic tpu program, no host features"))
    (src / "raw_garbage").write_bytes(b"not zstd at all")  # fail-open: kept
    dst = tmp_path / "out"
    n, n_cpu = mp.package(str(src), str(dst))
    assert (n, n_cpu) == (2, 1)
    names = sorted(p.name for p in dst.iterdir())
    assert names == ["raw_garbage.gz", "tpu_entry.gz"]
    # round-trip: sync unpacks what the packager wrote, byte-identically
    cache = tmp_path / "cache"
    cache.mkdir()
    assert _sync_prebuilt(str(cache), str(dst)) == 2
    assert (cache / "tpu_entry").read_bytes() == (
        src / "tpu_entry").read_bytes()


_AXON_VERSION = (
    "PJRT C API\n"
    "axon 0.1.0; SerializedExecutable v9; compile-cache v14; compat c49\n"
    "TFRT TPU v5 lite\n"
    "Built on Nov 12 2025 14:16:36 (1762985796) cl/831091709"
)


def test_normalized_platform_version_strips_build_stamp():
    """The 'Built on ...' line churns per backend redeploy (it shifted every
    cache key between rounds 3 and 4); the compat markers are the real
    compatibility contract and must survive normalization."""
    from tpu_ray.utils.cache import normalized_platform_version

    n = normalized_platform_version(_AXON_VERSION)
    assert "Built on" not in n
    assert "compat c49" in n and "PJRT C API" in n and "TFRT TPU v5 lite" in n
    redeployed = _AXON_VERSION.replace(
        "Nov 12 2025 14:16:36 (1762985796) cl/831091709",
        "Jan 01 2026 00:00:01 (1767225601) cl/999999999")
    assert normalized_platform_version(redeployed) == n
    # a REAL compat change must still shift the normalized string
    assert normalized_platform_version(
        _AXON_VERSION.replace("compat c49", "compat c50")) != n


def test_platform_key_patch_ignores_build_stamp_only():
    from tpu_ray.utils import cache as c

    assert c._patch_platform_key()
    import hashlib

    from jax._src import cache_key as ck

    class B:
        platform = "tpu"

    def digest(version):
        b = B()
        b.platform_version = version
        h = hashlib.sha256()
        ck._hash_platform(h, b)
        return h.digest()

    assert digest(_AXON_VERSION) == digest(_AXON_VERSION.replace(
        "cl/831091709", "cl/000000001"))
    assert digest(_AXON_VERSION) != digest(_AXON_VERSION.replace(
        "SerializedExecutable v9", "SerializedExecutable v10"))


def test_stats_listener_counts_hits_and_misses():
    from tpu_ray.utils import cache as c

    c._install_stats_listener()
    before = c.cache_stats()
    from jax._src import monitoring

    monitoring.record_event("/jax/compilation_cache/cache_hits")
    monitoring.record_event("/jax/compilation_cache/cache_misses")
    monitoring.record_event("/jax/compilation_cache/cache_misses")
    after = c.cache_stats()
    assert after["hits"] - before["hits"] == 1
    assert after["misses"] - before["misses"] == 2


def test_cache_keys_independent_of_cache_dir(tmp_path):
    """THE round-3 cold-start killer: jax's persistent-cache 'XLA caches'
    feature writes the cache DIRECTORY PATH into the hashed compile
    options, so entries staged in one directory could never hit from
    another (prebuilt/xla was staged in /tmp, consumed from ~/.cache).
    enable_compilation_cache must produce identical keys in any dir."""
    import json
    import subprocess
    import sys

    script = r"""
import json, os, sys
sys.path.insert(0, sys.argv[2])
from tpu_ray.utils.cache import enable_compilation_cache
os.environ["TPU_RAY_PREBUILT"] = "0"
d = enable_compilation_cache(sys.argv[1])
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
f = jax.jit(lambda x: jnp.sin(x) * 3 + 1)
f(jnp.ones((16, 16), jnp.float32)).block_until_ready()
print(json.dumps(sorted(os.listdir(d))))
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    keys = []
    for sub in ("deep/nested/cache_a", "b"):
        d = tmp_path / sub
        r = subprocess.run(
            [sys.executable, "-c", script, str(d), repo],
            capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-800:]
        keys.append(json.loads(r.stdout.splitlines()[-1]))
    assert keys[0] == keys[1]
    assert keys[0]  # non-empty: entries were actually written


def test_cache_normalizes_mosaic_kernel_locations(tmp_path, monkeypatch):
    """Pallas kernels serialize Python traceback LOCATIONS (including the
    entry script's frames) into their tpu_custom_call payload, which the
    key's strip-debuginfo pass cannot reach - five different entry
    scripts produced five different keys for one ladder executable.
    enable_compilation_cache must pin locations to the nearest user
    frame (the stable in-package call site).

    Scoped to a tmp cache dir and restored after: pointing the TEST
    process at the live ~/.cache dir made every later test load any
    matching entries - including foreign-machine XLA:CPU AOT results
    from prebuilt sync, whose numerics differ by 1-2 ulp from locally
    compiled code (r5: two goldens failed order-dependently)."""
    import jax

    from tpu_ray.utils.cache import enable_compilation_cache

    old_dir = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("TPU_RAY_PREBUILT", "0")
    try:
        enable_compilation_cache(str(tmp_path))
        assert jax.config.jax_include_full_tracebacks_in_locations is False
        assert jax.config.jax_persistent_cache_enable_xla_caches == "none"
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)


def test_platform_mismatch_ignores_code_provenance(tmp_path, monkeypatch):
    """PLATFORM.txt's trailing 'code <sha>' line is provenance for humans
    (which commit staged the entries); the mismatch decision must use only
    the jax + normalized backend lines."""
    import jax
    import jax.extend

    from tpu_ray.utils import cache as c

    pre = tmp_path / "prebuilt" / "xla"
    pre.mkdir(parents=True)
    monkeypatch.setattr(c, "_prebuilt_dir", lambda: str(pre))
    current = "\n".join([
        jax.version._version,
        c.normalized_platform_version(
            jax.extend.backend.get_backend().platform_version),
    ]).strip()
    (tmp_path / "prebuilt" / "PLATFORM.txt").write_text(
        current + "\ncode 0123abc-dirty\n")
    assert c.prebuilt_platform_mismatch() is None
    (tmp_path / "prebuilt" / "PLATFORM.txt").write_text(
        "jax 0.0.1\nother backend\ncode 0123abc\n")
    msg = c.prebuilt_platform_mismatch()
    assert msg is not None and "regenerate" in msg


def test_cpu_platform_skips_persistent_cache(monkeypatch):
    """On the CPU platform the persistent cache must stay OFF unless a
    dir is pinned: XLA:CPU entries embed the compile host's features and
    $HOME persists across machines here (r5: foreign AOT entries flipped
    golden bits and SIGILLed a CLI subprocess)."""
    import jax

    from tpu_ray.utils.cache import enable_compilation_cache

    monkeypatch.delenv("TPU_RAY_CACHE_DIR", raising=False)
    assert str(jax.config.jax_platforms).startswith("cpu")  # conftest
    assert enable_compilation_cache() == ""
    # an explicit dir still wins (tests that NEED a scoped cache)
    import tempfile

    old = jax.config.jax_compilation_cache_dir
    try:
        with tempfile.TemporaryDirectory() as td:
            assert enable_compilation_cache(td) == td
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
