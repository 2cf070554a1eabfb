"""Golden end-to-end test (SURVEY.md §5): DCF dictionary -> spec -> DAT
demux (two surveys) -> partitioned load -> evolved read -> cross-level join,
compared with hand-computed expected output.

This is the reference's whole pipeline (EP1 + EP3 + the README.md:90-94
query shape) in one pass: RECH1 (household members) joined to RECH4A
(country-specific extras) on the *padded* CASEID + line-number link the
[Relation] block declares."""

from __future__ import annotations

from pyspark.sql import functions as F

from dhs_to_database_spark.sources.cspro_dcf import parse_dcf_text
from dhs_to_database_spark.sources.fixed_width import demux_dat, spec_from_items
from dhs_to_database_spark.sources.sinks import write_partitioned
from tests.fixtures_cspro import DCF_TEXT, DAT_LINES

_DAT_LINES_512 = [
    "       9   944 H00 72",
    "       9   944 H01 1 33    ",
    "       9   944 H01 2 61    ",
    "       9   944 H4A 28",  # IDXH4=' 2' (cols 19-20), SH110A='8' (col 21)
]

CASEID_511 = "       1   901 "
CASEID_512 = "       9   944 "


def test_golden_pipeline(spark, tmp_path):
    # 1. dictionary -> flat spec -> compiled demux spec
    res = parse_dcf_text("TESTFC", DCF_TEXT)
    spec = spec_from_items(res.items)
    assert set(spec.records) == {"H00", "H01", "H4A"}

    # 2. two surveys' DAT files, surveyid from filename
    d = tmp_path / "dat"
    d.mkdir()
    (d / "511.TESTFC.DAT").write_text("\n".join(DAT_LINES) + "\n")
    (d / "512.TESTFC.DAT").write_text("\n".join(_DAT_LINES_512) + "\n")
    tables = demux_dat(spark, [str(d / "511.TESTFC.DAT"), str(d / "512.TESTFC.DAT")], spec)

    # 3. partitioned load + evolved read-back (surveyid stays STRING)
    from dhs_to_database_spark.plans.schema_evolution import read_evolved

    for name, df in tables.items():
        write_partitioned(df, str(tmp_path / "warehouse" / name))
    rech1 = read_evolved(spark, str(tmp_path / "warehouse" / "RECH1"))
    rech4a = read_evolved(spark, str(tmp_path / "warehouse" / "RECH4A"))

    # the relation from the DCF names the join: RECH1.HVIDX = RECH4A.IDXH4
    rel = [r for r in res.relations if r["RelName"] == "HH_MEMBERS"][0]
    assert (rel["PrimaryLink"], rel["SecondaryLink"]) == ("HVIDX", "IDXH4")

    # 4. the flagship cross-level shape: member age joined to CS extras
    joined = (
        rech1.join(
            rech4a,
            (rech1.surveyid == rech4a.surveyid)
            & (rech1.CASEID == rech4a.CASEID)
            & (rech1[rel["PrimaryLink"]] == rech4a[rel["SecondaryLink"]]),
        )
        .select(rech1.surveyid, rech1.CASEID, "HVIDX", "HV105", "SH110A")
        .orderBy("surveyid")
    )
    got = [tuple(r) for r in joined.collect()]
    # hand-computed: 511's H4A line has only a space at SH110A's col 21;
    # 512's has '8' there
    assert got == [
        ("511", CASEID_511, "1", "25", ""),
        ("512", CASEID_512, "2", "61", "8"),
    ]

    # 5. invariants: padded keys survived the round-trip; partition pruning
    assert {r["CASEID"] for r in rech1.select("CASEID").collect()} == {
        CASEID_511,
        "       2   902 ",  # second household in the 511 fixture
        CASEID_512,
    }
    pruned = rech1.filter(F.col("surveyid") == "511")
    assert pruned.count() == 3
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "surveyid" in plan
