"""datarepo_spark.streaming"""

from __future__ import annotations

import hashlib
import os


def checkpoint_txn_identity(query_name: str, checkpoint_dir: str) -> str:
    """Txn app id for a streaming writer, bound to its CHECKPOINT (the
    checkpoint defines epoch numbering — a fresh checkpoint restarts at
    epoch 0, and a bare query-name identity would classify those
    batches as replays of the dead stream's epochs and silently drop
    them).

    The checkpoint path is NORMALIZED before hashing: equivalent
    spellings of the same location ('/data/ckpt', '/data/ckpt/',
    'file:///data/ckpt') must produce the SAME identity, or a restart
    with a differently-spelled path would miss the ledger and re-land
    every replayed epoch. Scheme-less paths are resolved absolute;
    'file:' URIs with an empty or 'localhost' authority are reduced to
    their path (RFC 8089 — they name the same local location as the
    bare path); a 'file://<host>/...' URI with any other authority
    keeps scheme + host + normalized path, like the generic scheme
    branch (hdfs, s3a); trailing slashes are stripped everywhere.

    MIGRATION HAZARD (pre-r8 identities): before normalization existed
    (r7), the identity hashed the RAW spelling. A stream whose
    checkpoint was spelled non-canonically (trailing slash, relative
    path, 'file://' prefix) therefore changes identity across the
    upgrade, and a crash-replayed epoch straddling the upgrade would be
    re-admitted under the new identity. When upgrading a live stream
    whose checkpoint spelling was non-canonical, either restart it from
    a clean stop (no in-flight epoch), or start it with a FRESH
    checkpoint (new epochs, new identity — no ledger to miss).
    Canonically-spelled absolute paths are unaffected."""
    d = checkpoint_dir.strip()
    if d.startswith("file:/") and "://" not in d:
        # RFC 8089 minimal ABSOLUTE form 'file:/data/ckpt' (the spelling
        # Hadoop/Spark itself renders) — no authority at all; same local
        # location as the bare path. Without this branch the '://' check
        # misses it and the path would resolve cwd-RELATIVE below.
        # Restricted to 'file:/' on purpose: an invalid relative
        # spelling like 'file:data/ckpt' must NOT silently become
        # '/data/ckpt' (it would collide with the canonical absolute
        # path's identity) — it falls through and resolves like any
        # other odd relative spelling instead.
        d = d[len("file:"):]
        d = os.path.normpath(d)
    elif "://" in d:
        scheme, _, rest = d.partition("://")
        host, _, path = rest.partition("/")
        norm = os.path.normpath("/" + path) if path else "/"
        if scheme == "file" and host in ("", "localhost"):
            d = norm  # same local location as the bare-path spelling
        else:
            d = f"{scheme}://{host}{norm}"
    else:
        d = os.path.normpath(os.path.abspath(d))
    d = d.rstrip("/") or "/"
    return query_name + "-" + hashlib.sha256(d.encode()).hexdigest()[:12]
