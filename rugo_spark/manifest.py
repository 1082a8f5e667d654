"""Per-partition lineage manifest: atomic sidecars + rugo-parity reader.

Each encoded partition writes one JSON sidecar (temp + rename, atomic) under
``<out>/manifest/``.  The sidecar carries the lineage record the north rule
requires — partition id, per-column codec choice, input/output bytes, row
counts, checksum — which is the same vocabulary as the reference's 18-field
per-column-chunk record (rugo ``metadata.hpp:12-43``, dict assembly
``metadata_reader.pyx:102-174``).  ``read_manifest`` exposes a
rugo-``read_metadata``-shaped nested dict for functional parity.
"""

from __future__ import annotations

import base64
import json
import os

import pyarrow as pa

SCHEMA_FILE = "_schema.json"
PLAN_FILE = "_plan.json"
CODEC_PLANS_FILE = "_codec_plans.json"
MANIFEST_DIR = "manifest"
BLOCKS_DIR = "blocks"

# Spark-side manifest row schema (applyInArrow output)
MANIFEST_DDL = (
    "partition_id int, n_rows long, n_tokens long, input_bytes long, "
    "output_bytes long, block_path string, checksum long, codecs string"
)
MANIFEST_ARROW = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("n_rows", pa.int64()),
        ("n_tokens", pa.int64()),
        ("input_bytes", pa.int64()),
        ("output_bytes", pa.int64()),
        ("block_path", pa.string()),
        ("checksum", pa.int64()),
        ("codecs", pa.string()),
    ]
)


def write_schema(
    out_dir: str, arrow_schema: pa.Schema, spark_schema_json: str, extra: dict | None = None
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    payload = {
        "arrow_schema_b64": base64.b64encode(arrow_schema.serialize().to_pybytes()).decode(),
        "spark_schema": json.loads(spark_schema_json),
        **(extra or {}),
    }
    tmp = os.path.join(out_dir, SCHEMA_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(out_dir, SCHEMA_FILE))


def read_schema_payload(out_dir: str) -> dict | None:
    """Raw _schema.json payload (None if absent) — carries resume guards."""
    path = os.path.join(out_dir, SCHEMA_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def read_schema(out_dir: str) -> tuple[pa.Schema, dict]:
    path = os.path.join(out_dir, SCHEMA_FILE)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"not an encoded dataset (missing {SCHEMA_FILE}): {out_dir}"
        )
    with open(os.path.join(out_dir, SCHEMA_FILE)) as f:
        payload = json.load(f)
    schema = pa.ipc.read_schema(pa.py_buffer(base64.b64decode(payload["arrow_schema_b64"])))
    return schema, payload["spark_schema"]


def write_plan(out_dir: str, plan: dict) -> None:
    """Persist the realized partitioning plan (size→cumulative-mass map)
    beside the manifest, atomically.  A resumed encode replays this map
    instead of re-scanning the input — partition ids stay stable across
    restarts by construction, not by re-derivation."""
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, PLAN_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(plan, f)
    os.replace(tmp, os.path.join(out_dir, PLAN_FILE))


def read_plan(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, PLAN_FILE)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def read_plan_checked(out_dir: str, require: bool = False) -> dict | None:
    """Resume-time plan read with the fail-loudly contract shared by every
    encode path: if completed sidecars exist, a plan file that is missing-
    but-expected (``require=True`` — e.g. the sorted path always writes its
    plan first, so its absence means the dataset was written by a DIFFERENT
    path), unreadable, or not a JSON object raises instead of letting a
    silent re-plan assign a different layout (the anti-join would then drop
    or duplicate rows).  Returns None when there is nothing to resume."""
    if not completed_partitions(out_dir):
        return None
    plan = read_plan(out_dir)
    if plan is None:
        if os.path.exists(os.path.join(out_dir, PLAN_FILE)):
            raise ValueError(
                f"corrupt {PLAN_FILE} beside completed partitions in {out_dir}; "
                "restore it or clear the dataset before re-encoding"
            )
        if require:
            raise ValueError(
                f"{out_dir} has completed partitions but no {PLAN_FILE} — it was "
                "written by a different encode path; resume it with that path "
                "or clear the dataset"
            )
        return None
    if not isinstance(plan, dict):
        raise ValueError(
            f"corrupt {PLAN_FILE} beside completed partitions in {out_dir} "
            f"(expected a JSON object, got {type(plan).__name__}); restore it "
            "or clear the dataset before re-encoding"
        )
    return plan


def write_codec_plans(out_dir: str, plans: dict) -> None:
    """Persist the job-level per-column codec plans (pinned codec names +
    base64 FSST symbol tables) beside the manifest, atomically.  Written
    BEFORE any data moves, so a resumed encode replays the exact same codec
    decisions — the bit-identical-resume contract extends to plan-pinned
    tables.  An empty dict is meaningful: it records that pinning was
    decided (and declined), so resume does not re-decide differently."""
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, CODEC_PLANS_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(plans, f)
    os.replace(tmp, os.path.join(out_dir, CODEC_PLANS_FILE))


def read_codec_plans(out_dir: str) -> dict | None:
    path = os.path.join(out_dir, CODEC_PLANS_FILE)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def sidecar_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"part-{partition_id:06d}.json")


def write_sidecar(out_dir: str, row: dict) -> None:
    """Atomic (temp + rename) — a crash mid-write never yields a torn
    sidecar, and the attempt-unique temp name keeps concurrent speculative
    attempts of one task from interleaving into a shared inode."""
    import uuid

    path = sidecar_path(out_dir, row["partition_id"])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.inprogress.{uuid.uuid4().hex[:12]}"
    with open(tmp, "w") as f:
        json.dump(row, f)
    os.replace(tmp, path)


def completed_partitions(out_dir: str) -> list[dict]:
    """All valid sidecars (torn/partial files are skipped → re-encoded)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    rows = []
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                rows.append(json.load(f))
        except (json.JSONDecodeError, OSError):
            continue
    return rows


APPENDS_DIR = "_appends"
APPEND_BAND = 1_000_000  # partition-id band reserved per append session


def append_reservations(out_dir: str) -> list[dict]:
    """All append band reservations (``_appends/append-*.json``), each
    ``{"base": int, "fingerprint": str, "complete": bool}``; unreadable
    markers surface as incomplete reservations with base -1 so allocation
    fails safe."""
    adir = os.path.join(out_dir, APPENDS_DIR)
    if not os.path.isdir(adir):
        return []
    out = []
    for name in sorted(os.listdir(adir)):
        if not (name.startswith("append-") and name.endswith(".json")):
            continue
        path = os.path.join(adir, name)
        try:
            with open(path) as f:
                m = json.load(f)
            m.setdefault("complete", False)
            m["_path"] = path
            out.append(m)
        except (json.JSONDecodeError, OSError):
            out.append({"base": -1, "fingerprint": "?", "complete": False, "_path": path})
    return out


def incomplete_append_bands(out_dir: str) -> list[tuple[int, int]]:
    """[start, end) partition-id ranges of append sessions that have NOT
    flipped their completion marker — readers must not surface these."""
    return [
        (int(m["base"]), int(m["base"]) + APPEND_BAND)
        for m in append_reservations(out_dir)
        if not m["complete"] and int(m.get("base", -1)) >= 0
    ]


def visible_partitions(out_dir: str) -> list[dict]:
    """``completed_partitions`` minus blocks inside INCOMPLETE append bands:
    the read-side half of append atomicity.  An in-flight (or crashed)
    append publishes sidecars per partition, but readers see none of them
    until the append's completion marker flips — old rows only, then old
    plus ALL new, never a torn middle.  Resume paths keep using
    ``completed_partitions`` (they must see partial state to skip it)."""
    rows = completed_partitions(out_dir)
    bands = incomplete_append_bands(out_dir)
    if not bands:
        return rows
    return [
        r for r in rows
        if not any(lo <= int(r["partition_id"]) < hi for lo, hi in bands)
    ]


def read_manifest(out_dir: str) -> dict:
    """rugo-parity surface: nested dict shaped like ``read_metadata``'s output
    (reference ``metadata_reader.pyx:102-174`` / ``README.md:166-200``) —
    ``{num_rows, row_groups: [{num_rows, total_byte_size, columns: [...]}],
    schema: [...]}`` with one "row group" per encoded partition and the same
    per-column field names (num_values, total_compressed_size,
    total_uncompressed_size, encodings, codec, null_count, …).
    """
    rows = completed_partitions(out_dir)
    arrow_schema, spark_schema = read_schema(out_dir)
    row_groups = []
    for r in rows:
        codecs = json.loads(r["codecs"])
        columns = []
        for name in arrow_schema.names:
            c = codecs.get(name, {})
            columns.append(
                {
                    "name": name,
                    "physical_type": str(arrow_schema.field(name).type),
                    "logical_type": str(arrow_schema.field(name).type),
                    "num_values": r["n_rows"],
                    "total_compressed_size": c.get("enc_bytes"),
                    "total_uncompressed_size": c.get("raw_bytes"),
                    "null_count": c.get("null_count"),
                    "distinct_count": None,
                    "min": c.get("min"),
                    "max": c.get("max"),
                    "encodings": [c.get("codec")] + (
                        [c["lengths_codec"]] if c.get("lengths_codec") else []
                    ),
                    "codec": c.get("outer", "zstd-auto"),
                    "key_value_metadata": {"block_path": r["block_path"]},
                }
            )
        row_groups.append(
            {
                "num_rows": r["n_rows"],
                "total_byte_size": r["output_bytes"],
                "columns": columns,
            }
        )
    return {
        "num_rows": sum(r["n_rows"] for r in rows),
        "row_groups": row_groups,
        "schema": [
            {"name": f.name, "logical_type": str(f.type), "num_children": 0}
            for f in arrow_schema
        ],
    }
