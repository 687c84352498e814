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
