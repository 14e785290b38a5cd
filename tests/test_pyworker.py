"""tame_zipimport_caches: the per-task zipimport invalidation no-op (r16).

The optimization patches live zipimporter INSTANCES in
sys.path_importer_cache so pyspark.worker's per-task
``importlib.invalidate_caches()`` stops re-reading immutable archive
directories (measured 112-159 ms per Python task — see
operators/pyworker.py). These tests pin the mechanism without a Spark
session: instance-level patch, idempotence, directory finders untouched,
and imports from a patched archive still working.
"""

from __future__ import annotations

import importlib
import os
import sys
import zipfile
import zipimport

from ab_inbev_big_data_case_spark.operators.pyworker import (
    _noop_invalidate,
    tame_zipimport_caches,
)


def _make_zip(tmp_path, name="tzmod.zip"):
    zpath = os.path.join(str(tmp_path), name)
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("tz_probe_mod.py", "VALUE = 41\n")
    return zpath


def test_patches_zipimporter_instances(tmp_path):
    zpath = _make_zip(tmp_path)
    finder = zipimport.zipimporter(zpath)
    sys.path_importer_cache[zpath] = finder
    try:
        assert finder.invalidate_caches is not _noop_invalidate
        tame_zipimport_caches()
        assert finder.invalidate_caches is _noop_invalidate
        # importlib.invalidate_caches() now skips the archive re-read and
        # must not raise
        importlib.invalidate_caches()
    finally:
        del sys.path_importer_cache[zpath]


def test_idempotent_and_import_still_works(tmp_path):
    zpath = _make_zip(tmp_path, "tzmod2.zip")
    sys.path.insert(0, zpath)
    try:
        import tz_probe_mod  # noqa: F401 — resolves via the zip finder

        assert tz_probe_mod.VALUE == 41
        tame_zipimport_caches()
        tame_zipimport_caches()  # second call is a cheap no-op walk
        finder = sys.path_importer_cache.get(zpath)
        assert finder is not None
        assert finder.invalidate_caches is _noop_invalidate
        # the patched finder still serves imports
        importlib.reload(tz_probe_mod)
        assert tz_probe_mod.VALUE == 41
    finally:
        sys.path.remove(zpath)
        sys.modules.pop("tz_probe_mod", None)
        sys.path_importer_cache.pop(zpath, None)


def test_directory_finders_untouched(tmp_path):
    d = str(tmp_path)
    importlib.invalidate_caches()
    finder = importlib.machinery.FileFinder(d)
    sys.path_importer_cache[d] = finder
    try:
        before = finder.invalidate_caches
        tame_zipimport_caches()
        # FileFinder (directory) invalidation must stay intact: addPyFile
        # lands new files in the Spark files DIRECTORY, which must remain
        # visible to reused workers
        assert sys.path_importer_cache[d].invalidate_caches == before
    finally:
        del sys.path_importer_cache[d]
