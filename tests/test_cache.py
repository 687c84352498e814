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
