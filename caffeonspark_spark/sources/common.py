"""Shared plumbing for the custom Python DataSources (lmdb / seqfile /
imagedir): user-schema column-prune validation and the per-row checksum
metrics the declared scan queries roll up. One implementation — the
three sources must not drift (r15 review finding)."""

from __future__ import annotations


def validated_fields(schema, fields: dict[str, str]) -> list[str]:
    """Requested field names, in the user's order, validated against the
    source's ``{name: spark_type}`` map — an unknown name or a wrong type
    fails LOUDLY at plan time instead of yielding misaligned tuples."""
    if schema is None:
        return list(fields)
    out = []
    for f in schema.fields:
        want = fields.get(f.name)
        if want is None:
            raise ValueError(
                f"unknown column {f.name!r}; this source has "
                f"{sorted(fields)}"
            )
        if f.dataType.simpleString() != want:
            raise ValueError(
                f"column {f.name!r} must be {want}, got "
                f"{f.dataType.simpleString()}"
            )
        out.append(f.name)
    if not out:
        raise ValueError("pruned schema must keep at least one column")
    return out


def pruned_ddl(columns: list[str], fields: dict[str, str]) -> str:
    """DDL string for a ``columns=`` subset, validated against the
    source's field map (the user-facing half of source-level pruning)."""
    unknown = [c for c in columns if c not in fields]
    if unknown:
        raise ValueError(
            f"unknown columns {unknown}; known: {sorted(fields)}"
        )
    return ", ".join(f"{c} {fields[c]}" for c in columns)


def row_metrics(pdfs):
    """Scan batches → per-row (label, enc, channels, dlen, wsum) where
    wsum = Σ data[i]·(i+1) over the bytes THE SCAN RETURNED — the
    checksum the DuckDB oracles recompute in closed form, so any
    writer/reader/decode defect lands in the hash. Shared by the LMDB
    and SequenceFile declared queries (Arrow-batched)."""
    import numpy as np
    import pandas as pd

    for pdf in pdfs:
        dlen, wsum = [], []
        for raw in pdf["data"]:
            b = np.frombuffer(bytes(raw), dtype=np.uint8)
            dlen.append(len(b))
            wsum.append(int(b.astype(np.int64) @ (np.arange(len(b)) + 1)))
        yield pd.DataFrame(
            {
                "id": pdf["id"],
                "label": pdf["label"],
                "enc": pdf["encoded"].astype("int64"),
                "channels": pdf["channels"].astype("int64"),
                "dlen": pd.Series(dlen, dtype="int64"),
                "wsum": pd.Series(wsum, dtype="int64"),
            }
        )


ROW_METRICS_SCHEMA = (
    "id string, label string, enc long, channels long, dlen long, wsum long"
)


def pid_alive(pid: int) -> bool:
    """Best-effort liveness probe (signal 0); PermissionError means the
    pid exists but is owned elsewhere — alive for sweeping purposes."""
    import os

    if pid == os.getpid():
        return True
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def sweep_stale_pid_dirs(prefix: str, keep_latest: int = 0) -> None:
    """Remove ``/tmp/<prefix><pid>_<seq>`` staging dirs belonging to THIS
    process (earlier invocations) or to DEAD processes — per-pid sweeps
    alone leak one directory per exited process forever (r15 review 2).
    Dirs of other LIVE processes are left alone.

    ``keep_latest=N`` preserves this process's N highest-``<seq>`` dirs:
    a DataFrame returned by a PREVIOUS invocation still scans its export
    lazily, so the caller keeps the prior invocation alive and sweeps
    only older ones (r15 ADVICE)."""
    import glob
    import os
    import shutil

    me = os.getpid()
    mine: list[tuple[int, str]] = []
    for d in glob.glob(f"/tmp/{prefix}*_*"):
        tail = os.path.basename(d)[len(prefix):]
        pid_s, _, seq_s = tail.partition("_")
        if not pid_s.isdigit():
            continue
        pid = int(pid_s)
        if pid == me and keep_latest and seq_s.isdigit():
            mine.append((int(seq_s), d))
            continue
        if pid == me or not pid_alive(pid):
            shutil.rmtree(d, ignore_errors=True)
    for _, d in sorted(mine)[:-keep_latest or None]:
        shutil.rmtree(d, ignore_errors=True)
