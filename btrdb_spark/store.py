"""Atomic generation-pointer storage for mutable parquet tables.

The reference commits a tree by flipping the superblock pointer after all
blocks are durable (internal/bstore/blockstore.go:317-360): a crash
between the data write and the pointer flip leaves the previous version
fully intact. This module is that superblock for parquet directories:

- table ``t`` lives in generation directories ``t.g<N>/``;
- the file ``t.CURRENT`` names the live generation;
- a rewrite builds ``t.g<N+1>`` next to the live one — hardlinking every
  partition directory it does NOT touch, so rewrite cost is O(changed
  partition), not O(table) — and then atomically renames a new pointer
  file into place (write tmp + fsync + os.rename, atomic on POSIX).

Readers resolve the pointer first; at no instant is the table missing,
half-swapped, or mixed between generations. Old generations are left on
disk (open readers may still be scanning them — the MVCC analog of the
reference keeping old tree roots readable) and can be reaped with
``gc_generations`` once no reader needs them.

Appends (the hot-buffer/journal analog) go straight into the live
generation directory: parquet file creation is itself write-new-then-
rename per file, and a torn append is at worst a replayable partial
batch, which is exactly the reference's journal recovery contract
(jprovider.go). On a cluster this whole module is a Delta/Iceberg
table's transaction log; the engine relies only on "atomic publish +
append", which both provide.
"""

from __future__ import annotations

import os
import re

_GEN_RE = re.compile(r"\.g(\d+)$")


def _pointer(base: str, name: str) -> str:
    return os.path.join(base, f"{name}.CURRENT")


def resolve(base: str, name: str) -> str | None:
    """Path of the live generation directory, or None if the table has
    never been written. Falls back to a legacy bare ``{name}`` directory
    (pre-pointer layout) so existing data stays readable."""
    ptr = _pointer(base, name)
    if os.path.exists(ptr):
        with open(ptr) as f:
            gen = f.read().strip()
        path = os.path.join(base, gen)
        return path if os.path.exists(path) else None
    legacy = os.path.join(base, name)
    return legacy if os.path.exists(legacy) else None


def current_dir(base: str, name: str, create: bool = False) -> str | None:
    """Live generation dir for in-place appends; with create=True an empty
    generation 0 is created and published first."""
    cur = resolve(base, name)
    if cur is None and create:
        cur = os.path.join(base, f"{name}.g0")
        os.makedirs(cur, exist_ok=True)
        publish(base, name, cur)
    return cur


def new_generation(base: str, name: str) -> str:
    """Fresh, not-yet-live generation directory (monotonic numbering)."""
    nums = [
        int(m.group(1))
        for d in os.listdir(base)
        if d.startswith(f"{name}.g")
        for m in [_GEN_RE.search(d)]
        if m
    ] if os.path.exists(base) else []
    gen = os.path.join(base, f"{name}.g{(max(nums) + 1) if nums else 0}")
    os.makedirs(gen, exist_ok=True)
    return gen


def publish(base: str, name: str, gen_path: str) -> None:
    """Atomically flip the table pointer to ``gen_path``. This is the ONLY
    state transition; everything before it is invisible to readers and
    everything after it is complete."""
    tmp = _pointer(base, name) + ".tmp"
    with open(tmp, "w") as f:
        f.write(os.path.basename(gen_path))
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, _pointer(base, name))  # atomic on POSIX


def link_tree(src: str, dst: str) -> None:
    """Recreate ``src`` under ``dst`` with hardlinked files: O(#files)
    metadata operations, zero data copied. Used for the partition
    directories a rewrite does not touch."""
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out, exist_ok=True)
        for fn in files:
            os.link(os.path.join(root, fn), os.path.join(out, fn))


def link_unchanged_partitions(cur: str, gen: str, exclude_subdir: str) -> None:
    """Hardlink every top-level partition directory of the live generation
    except ``exclude_subdir`` (the one the caller will rewrite)."""
    for d in os.listdir(cur):
        full = os.path.join(cur, d)
        if os.path.isdir(full) and d != exclude_subdir:
            link_tree(full, os.path.join(gen, d))


def gc_generations(base: str, name: str, keep: int = 2) -> list[str]:
    """Remove all but the newest ``keep`` non-live generations. Only safe
    once no reader holds plans resolved against them."""
    import shutil

    live = resolve(base, name)
    gens = sorted(
        (
            os.path.join(base, d)
            for d in os.listdir(base)
            if d.startswith(f"{name}.g") and _GEN_RE.search(d)
        ),
        key=lambda p: int(_GEN_RE.search(p).group(1)),
    )
    pool = gens[:-keep] if keep else gens
    victims = [g for g in pool if g != live]
    for g in victims:
        shutil.rmtree(g, ignore_errors=True)
    return victims
