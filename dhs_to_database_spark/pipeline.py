"""End-to-end pipeline driver — the reference's EP1-EP3 lifecycle as one
callable (lib02_Unzip_And_Organise_Downloads.py:97-125 -> DCF_Parser ->
DAT_Parser -> load).

Stages (each is independently exposed by the source/plan modules; this
driver only sequences them):

1. **Stage** (optional): unzip downloads into ``staging_folder`` —
   manifest-keyed batch mode or filename-keyed manual mode (A1-A3, A18).
2. **Parse dictionaries**: distributed DCF parse over every staged ``*.dcf``
   (one task per file, A5-A12); optionally emit the three spec CSVs (A13).
3. **Demux data files**: per dictionary, compile the fixed-width spec and
   split its ``*.dat`` into per-record-type tables (A14-A17). Dictionaries
   with IDENTICAL compiled specs are demuxed together — one text scan per
   spec group, however many surveys share it.
4. **Load**: dynamic-partition-overwrite parquet per record table,
   partitioned by surveyid (A22 drop-and-reload; read back with
   ``plans.schema_evolution.read_evolved`` for the union-of-columns view).

Scale notes: the driver touches only spec-sized data (items rows, file
lists); all row-level work stays in executor tasks. One survey = one
partition overwrite, so re-running a survey is idempotent and leaves other
surveys' partitions untouched.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .sources.cspro_dcf import parse_dcf_files
from .sources.fixed_width import (
    DatSpec,
    demux_to_parquet,
    spec_from_items,
    unknown_tags,
)
from .sources.sinks import write_spec_csvs
from .sources.staging import stage_batch, stage_manual


@dataclass
class PipelineResult:
    """What the run produced: record-table paths, staged file list, and the
    log-and-skip diagnostics (lines whose record tag no spec knows)."""

    tables: dict[str, str] = field(default_factory=dict)
    staged: list[str] = field(default_factory=list)
    unknown_tag_counts: DataFrame | None = None
    items: DataFrame | None = None
    values: DataFrame | None = None
    relations: DataFrame | None = None


def _find_files(root: str, ext: str) -> list[str]:
    """Case-insensitive recursive ``*.<ext>`` listing (driver-side; file
    lists are spec-sized)."""
    out = []
    for dirpath, _dirs, names in os.walk(root):
        out.extend(
            os.path.join(dirpath, n) for n in names if n.lower().endswith("." + ext)
        )
    return sorted(out)


def _spec_signature(spec: DatSpec) -> tuple:
    """Hashable identity of a compiled spec — dictionaries that compile to
    the same layout can share one demux scan."""
    return (
        spec.rt_start,
        spec.rt_len,
        tuple(
            (tag, rec.record_name, rec.fields)
            for tag, rec in sorted(spec.records.items())
        ),
    )


def run_pipeline(
    spark: SparkSession,
    staging_folder: str,
    warehouse_dir: str,
    *,
    downloads_folder: str | None = None,
    manifest_path: str | None = None,
    spec_dir: str | None = None,
    expand_ranges: str = "All",
) -> PipelineResult:
    """Run stages 1-4; see module docstring. ``staging_folder`` is scanned
    recursively for ``<filecode>.dcf`` / ``<filecode>.dat`` pairs (the
    naming ``stage_zip`` produces); pass ``downloads_folder`` (and
    optionally ``manifest_path`` for batch mode) to unzip first."""
    result = PipelineResult()

    # -- stage 1: unzip ----------------------------------------------------
    if downloads_folder is not None:
        if manifest_path is not None:
            result.staged = stage_batch(
                spark, manifest_path, downloads_folder, staging_folder
            )
        else:
            result.staged = stage_manual(spark, downloads_folder, staging_folder)

    # -- stage 2: dictionaries ---------------------------------------------
    dcf_files = _find_files(staging_folder, "dcf")
    if not dcf_files:
        raise FileNotFoundError(f"no .dcf files under {staging_folder!r}")
    items, values, relations = parse_dcf_files(
        spark, dcf_files, expand_ranges=expand_ranges
    )
    result.items, result.values, result.relations = items, values, relations
    if spec_dir is not None:
        write_spec_csvs(items, values, relations, spec_dir)

    # -- stage 3: compile specs, group identical ones, locate .dat files ---
    item_rows = [r.asDict() for r in items.collect()]  # spec-sized
    by_filecode: dict[str, list[dict]] = {}
    for r in item_rows:
        by_filecode.setdefault(r["FileCode"], []).append(r)
    dat_by_filecode = {
        os.path.basename(p).rsplit(".", 1)[0]: p
        for p in _find_files(staging_folder, "dat")
    }
    groups: dict[tuple, tuple[DatSpec, list[str]]] = {}
    for filecode, rows in sorted(by_filecode.items()):
        dat = dat_by_filecode.get(filecode)
        if dat is None:
            continue  # dictionary without data file: spec-only survey
        spec = spec_from_items(rows)
        sig = _spec_signature(spec)
        groups.setdefault(sig, (spec, []))[1].append(dat)

    # -- stage 4: demux + partitioned load ---------------------------------
    # dynamic overwrite: a re-run replaces exactly the surveys present in
    # the input, never other surveys' partitions (A22 drop-and-reload)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    unknown_frames = []
    for spec, dats in groups.values():
        result.tables.update(demux_to_parquet(spark, dats, spec, warehouse_dir))
        unknown_frames.append(unknown_tags(spark, dats, spec))
    if unknown_frames:
        acc = unknown_frames[0]
        for f2 in unknown_frames[1:]:
            acc = acc.unionByName(f2)
        result.unknown_tag_counts = acc
    return result
