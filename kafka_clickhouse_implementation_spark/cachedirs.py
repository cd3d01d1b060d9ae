"""Source-identity-tagged temp cache directories for derived artifacts
(stream replay wires, day-partitioned fact copies, interchange files).

Every derived-on-disk artifact MUST be keyed by the identity of the
parquet it was built from — realpath + size + mtime — not just the
sf_dir path: the driver regenerated the testdata in place between
rounds 3 and 4 (same paths, new bytes and even a new timestamp
encoding), and a path-keyed cache would have replayed STALE data into
every hermetic streaming query, failing their oracles with no code at
fault. A regeneration now changes the tag, so the cache rebuilds
itself.
"""

from __future__ import annotations

import hashlib
import os
import tempfile


def source_tagged_dir(flavor: str, sf_dir: str, table: str) -> str:
    """Temp dir for an artifact derived from ``{sf_dir}/{table}.parquet``,
    whose name digests the source file's identity. Callers keep their
    own completion markers inside it."""
    resolved = os.path.realpath(os.path.join(sf_dir, f"{table}.parquet"))
    st = os.stat(resolved)
    tag = hashlib.md5(
        f"{resolved}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    sf_name = os.path.basename(os.path.dirname(resolved))
    return os.path.join(
        tempfile.gettempdir(),
        "spark_graft_cache",
        f"{sf_name}_{table}_{flavor}_{tag}",
    )
