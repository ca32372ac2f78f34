"""Resumable staged pipelines: checkpointed multi-stage curation with
fingerprinted stage manifests (beyond-reference; the operational layer
the reference delegates to its cluster coordinator scripts,
``src/scripts/themis/cluster`` — re-expressed as content-addressed
parquet checkpoints).

Why this exists at 100 TB: a curation pipeline is many expensive
stages (dedup -> quality -> decontam -> chunk -> pack).  When stage 4
fails — or when only stage 3's parameters change — re-running the
whole DAG re-reads the corpus once per retry.  Here every stage
materializes to parquet under a root directory together with a
manifest carrying the stage's FINGERPRINT: sha256 over (stage name,
stage version, upstream fingerprints).  A re-run skips any stage
whose manifest fingerprint still matches — i.e. nothing upstream of
it changed — and recomputes exactly the suffix of the DAG that did.

Fingerprints are structural, not content hashes of the data: hashing
100 TB to decide whether to skip would cost what the skip saves.  The
``version`` token is the operator author's contract — bump it when
the stage's logic changes.  Source stages should fold their input
descriptor (path, snapshot id) into ``version`` so new input
invalidates the chain.

Writes are atomic-by-rename (the sources/gensort + streaming/cdc
discipline): each stage writes to ``<name>.tmp-<fingerprint>`` and
renames over the final directory, so a killed run never leaves a
half-written stage that a resume would trust.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_stage_manifest.json"


@dataclass
class Stage:
    """One pipeline stage.

    ``fn(spark, inputs)`` receives the named upstream DataFrames
    (read back from their checkpoints, so lineage never spans stages)
    and returns this stage's output DataFrame.  ``inputs`` names
    upstream stages; a source stage has none.  Bump ``version``
    whenever the stage's semantics change — it is part of the
    fingerprint.
    """

    name: str
    fn: Callable[[SparkSession, dict[str, DataFrame]], DataFrame]
    inputs: list[str] = field(default_factory=list)
    version: str = "1"


def _fingerprint(stage: Stage, upstream: dict[str, str]) -> str:
    basis = json.dumps(
        {
            "name": stage.name,
            "version": stage.version,
            "upstream": [upstream[i] for i in stage.inputs],
        },
        sort_keys=True,
    )
    return hashlib.sha256(basis.encode()).hexdigest()


def _manifest_path(root: str, name: str) -> str:
    return os.path.join(root, name, MANIFEST)


def _is_fresh(root: str, name: str, fingerprint: str) -> bool:
    try:
        with open(_manifest_path(root, name)) as f:
            return json.load(f).get("fingerprint") == fingerprint
    except (OSError, json.JSONDecodeError):
        return False


def run_pipeline(
    spark: SparkSession,
    stages: list[Stage],
    root: str,
) -> dict[str, str]:
    """Execute ``stages`` (listed in dependency order) under ``root``,
    skipping every stage whose checkpoint is fresh.  Returns
    {stage name: checkpoint directory}; read any stage's output with
    ``spark.read.parquet`` on that path.

    Raises ValueError on an unknown input name or a duplicate stage
    name — the DAG is validated before anything runs.
    """
    seen: set[str] = set()
    for s in stages:
        if s.name in seen:
            raise ValueError(f"duplicate stage name: {s.name}")
        missing = [i for i in s.inputs if i not in seen]
        if missing:
            raise ValueError(
                f"stage {s.name!r} depends on {missing} which are not "
                "defined earlier in the list"
            )
        seen.add(s.name)

    os.makedirs(root, exist_ok=True)
    fingerprints: dict[str, str] = {}
    paths: dict[str, str] = {}
    for stage in stages:
        fp = _fingerprint(stage, fingerprints)
        out_dir = os.path.join(root, stage.name)
        if not _is_fresh(root, stage.name, fp):
            inputs = {
                name: spark.read.parquet(paths[name])
                for name in stage.inputs
            }
            tmp = os.path.join(root, f"{stage.name}.tmp-{fp[:16]}")
            shutil.rmtree(tmp, ignore_errors=True)
            stage.fn(spark, inputs).write.mode("overwrite").parquet(tmp)
            with open(os.path.join(tmp, MANIFEST), "w") as f:
                json.dump(
                    {"fingerprint": fp, "version": stage.version}, f
                )
            shutil.rmtree(out_dir, ignore_errors=True)
            os.rename(tmp, out_dir)
        fingerprints[stage.name] = fp
        paths[stage.name] = out_dir
    return paths
