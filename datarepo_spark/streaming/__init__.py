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
    'file:' URIs are reduced to their path; other schemes (hdfs, s3a)
    keep scheme + normalized path; trailing slashes are stripped
    everywhere."""
    d = checkpoint_dir.strip()
    if d.startswith("file://"):
        d = d[len("file://"):] or "/"
    if "://" in d:
        scheme, _, rest = d.partition("://")
        host, _, path = rest.partition("/")
        norm = os.path.normpath("/" + path) if path else "/"
        d = f"{scheme}://{host}{norm}"
    else:
        d = os.path.normpath(os.path.abspath(d))
    d = d.rstrip("/") or "/"
    return query_name + "-" + hashlib.sha256(d.encode()).hexdigest()[:12]
