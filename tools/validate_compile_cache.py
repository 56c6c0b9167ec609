"""Validate (and purge corrupt entries from) the persistent compile cache.

jax's LRUCache historically wrote entries non-atomically, so a process
killed mid-write (timeout-bounded runs) or a reader racing a writer could
leave/see truncated files whose deserialization SIGSEGVs the process
(qchem_rs_tpu/__init__.py:_harden_compile_cache closes both paths going
forward). This tool sweeps an existing cache dir: every entry must
decompress cleanly (zstd/zlib frames detect truncation); failures and
orphaned temp files are deleted. Run once after upgrading, or any time a
cache-related crash is suspected:

    python tools/validate_compile_cache.py [cache_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import qchem_rs_tpu  # noqa: F401  (resolves the fingerprinted default dir)
from qchem_rs_tpu import __init__ as _pkg  # noqa


def main() -> int:
    import jax
    from jax._src.compilation_cache import decompress_executable

    cache_dir = (
        sys.argv[1] if len(sys.argv) > 1 else jax.config.jax_compilation_cache_dir
    )
    if not cache_dir or not os.path.isdir(cache_dir):
        print(f"no cache dir at {cache_dir!r}")
        return 0
    total = bad = tmps = 0
    for name in sorted(os.listdir(cache_dir)):
        path = os.path.join(cache_dir, name)
        if ".tmp" in name:
            os.unlink(path)
            tmps += 1
            continue
        if not name.endswith("-cache"):
            continue
        total += 1
        try:
            with open(path, "rb") as fh:
                decompress_executable(fh.read())
        except Exception as e:
            print(f"PURGING corrupt entry {name}: {type(e).__name__}: {e}")
            os.unlink(path)
            atime = path[: -len("-cache")] + "-atime"
            if os.path.exists(atime):
                os.unlink(atime)
            bad += 1
    print(f"{cache_dir}: {total} entries checked, {bad} purged, "
          f"{tmps} orphaned temp files removed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
