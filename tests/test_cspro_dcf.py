"""Unit tests for the DCF dictionary parser (SURVEY.md §2.A A5-A13)."""

from __future__ import annotations

import pytest

from dhs_to_database_spark.sources.cspro_dcf import (
    DcfParseError,
    parse_dcf_files,
    parse_dcf_text,
)
from tests.fixtures_cspro import DCF_TEXT


@pytest.fixture(scope="module")
def parsed():
    return parse_dcf_text("511.TESTFC", DCF_TEXT)


def items_by(parsed, **kv):
    return [
        i
        for i in parsed.items
        if all(i.get(k) == v for k, v in kv.items())
    ]


def test_record_description_row_first(parsed):
    """A6: [Dictionary] becomes the synthetic first row with the record-tag
    position and the load-bearing 'RecordDesciption' typo."""
    first = parsed.items[0]
    assert first["ItemType"] == "RecordDesciption"
    assert first["RecordName"] == "*"
    assert first["Start"] == "16"
    assert first["Len"] == "3"
    assert first["FileCode"] == "511.TESTFC"


def test_iditem_replay_into_every_record(parsed):
    """A7: CASEID is re-emitted as an IdItem row for each of the 3 records."""
    id_rows = items_by(parsed, ItemType="IdItem", Name="CASEID")
    assert {r["RecordName"] for r in id_rows} == {"RECH0", "RECH1", "RECH4A"}
    for r in id_rows:
        assert (r["Start"], r["Len"]) == ("1", "15")


def test_items_inherit_record_and_level_context(parsed):
    """A5: hierarchy is imputed from order."""
    hv105 = items_by(parsed, Name="HV105")[0]
    assert hv105["RecordName"] == "RECH1"
    assert hv105["RecordTypeValue"] == "H01"  # quotes stripped
    assert hv105["LevelName"] == "HOUSEHOLD"
    assert hv105["RecordLabel"] == "Household member schedule"


def test_file_level_defaults_applied(parsed):
    """A6: ZeroFill/DecimalChar file defaults flow into items."""
    hv006 = items_by(parsed, Name="HV006")[0]
    assert hv006["ZeroFill"] == "Yes"
    assert hv006["DecimalChar"] == "No"


def test_explicit_values(parsed):
    """A8: 'Value=1;Completed' -> explicit coded value rows."""
    vals = [v for v in parsed.values if v["Name"] == "HV015"]
    assert [(v["Value"], v["ValueDesc"], v["ValueType"]) for v in vals] == [
        ("1", "Completed", "ExplicitValue"),
        ("2", "Not at home", "ExplicitValue"),
        ("9", "Other reason", "ExplicitValue"),
    ]


def test_single_range_expansion(parsed):
    """A9: single in-cap range with strategy All -> one row per value."""
    vals = [v for v in parsed.values if v["Name"] == "HV006"]
    assert len(vals) == 12
    assert all(v["ValueType"] == "ExpandedRange" for v in vals)
    assert [v["Value"] for v in vals[:3]] == ["1", "2", "3"]


def test_multi_range_and_explicit_mix(parsed):
    """A8/A9: several ranges + an explicit value on one item; in-cap ranges
    expand, tags reflect multiplicity."""
    vals = [v for v in parsed.values if v["Name"] == "HV105"]
    expanded = [v for v in vals if v["ValueType"] == "ExpandedRange"]
    explicit = [v for v in vals if v["ValueType"] == "ExplicitValue"]
    assert len(expanded) == 96 + 902  # 0:95 and 96:997 both expand
    assert [(v["Value"], v["ValueDesc"]) for v in explicit] == [("998", "DK")]


def test_oversize_range_emits_endpoints(parsed):
    """A9: ranges over the cap emit RangeMin/RangeMax rows only."""
    vals = [v for v in parsed.values if v["Name"] == "HV438"]
    # endpoints are float-formatted, matching the reference's
    # float(min)/float(max) append
    assert [(v["Value"], v["ValueType"]) for v in vals] == [
        ("0.0", "RangeMin"),
        ("9000000.0", "RangeMax"),
    ]


def test_expansion_strategies():
    """A9: Multiple only expands multi-range items; None never expands."""
    multi = parse_dcf_text("fc", DCF_TEXT, expand_ranges="Multiple")
    hv006 = [v for v in multi.values if v["Name"] == "HV006"]
    assert [(v["Value"], v["ValueType"]) for v in hv006] == [
        ("1.0", "RangeMin"),
        ("12.0", "RangeMax"),
    ]
    hv105 = [v for v in multi.values if v["Name"] == "HV105" and v["ValueType"] == "ExpandedRange"]
    assert len(hv105) == 998
    none = parse_dcf_text("fc", DCF_TEXT, expand_ranges="None")
    hv105n = [v for v in none.values if v["Name"] == "HV105"]
    assert {v["ValueType"] for v in hv105n} == {"MultiRangeMin", "MultiRangeMax", "ExplicitValue"}


def test_relations_and_rowid(parsed):
    """A11: relation block emits one row per join; missing links -> *ROWID*."""
    rels = parsed.relations
    assert {
        (r["RelName"], r["PrimaryTable"], r["PrimaryLink"], r["SecondaryTable"], r["SecondaryLink"])
        for r in rels
    } == {
        ("HH_MEMBERS", "RECH1", "HVIDX", "RECH4A", "IDXH4"),
        ("OCC_JOIN", "RECH1", "*ROWID*", "RECH4A", "*ROWID*"),
    }


def test_joinable_item_tagging(parsed):
    """A12: items referenced by relations become JoinableItem."""
    assert items_by(parsed, Name="HVIDX")[0]["ItemType"] == "JoinableItem"
    assert items_by(parsed, Name="IDXH4")[0]["ItemType"] == "JoinableItem"
    assert items_by(parsed, Name="HV105")[0]["ItemType"] == "Item"


def test_fmetype_derived(parsed):
    """A13: FMETYPE = fme_char(Len)."""
    hv105 = items_by(parsed, Name="HV105")[0]
    assert hv105["FMETYPE"] == "fme_char(3)"


def test_value_desc_with_colon_not_a_range():
    """A8: a time in the description must not be read as a range."""
    text = (
        "[Dictionary]\nRecordTypeStart=1\nRecordTypeLen=3\n\n"
        "[Level]\nLabel=L\nName=L\n\n"
        "[Record]\nLabel=R\nName=R1\nRecordTypeValue='R01'\n\n"
        "[Item]\nLabel=Visit time\nName=VT\nStart=4\nLen=1\n\n"
        "[ValueSet]\nLabel=Visit time\nName=VT_VS1\n"
        "Value=1;Yes: between 2:00 and 6:00 pm\n\n"
    )
    res = parse_dcf_text("fc", text)
    assert [(v["Value"], v["ValueDesc"], v["ValueType"]) for v in res.values] == [
        ("1", "Yes: between 2:00 and 6:00 pm", "ExplicitValue")
    ]


def test_multiple_ranges_on_one_line():
    """A8 (DCF_Parser.py:428-437): '100:101 102:198;Days' on one line."""
    text = (
        "[Dictionary]\nRecordTypeStart=1\nRecordTypeLen=3\n\n"
        "[Level]\nLabel=L\nName=L\n\n"
        "[Record]\nLabel=R\nName=R1\nRecordTypeValue='R01'\n\n"
        "[Item]\nLabel=Days\nName=DD\nStart=4\nLen=3\n\n"
        "[ValueSet]\nLabel=Days\nName=DD_VS1\nValue=100:101 102:103;Days\n\n"
    )
    res = parse_dcf_text("fc", text)
    assert [(v["Value"], v["ValueType"]) for v in res.values] == [
        ("100", "ExpandedRange"),
        ("101", "ExpandedRange"),
        ("102", "ExpandedRange"),
        ("103", "ExpandedRange"),
    ]


def test_first_occurrence_wins():
    """A5 (DCF_Parser.py:474-476): duplicate keys in a chunk are discarded."""
    text = (
        "[Dictionary]\nRecordTypeStart=1\nRecordTypeLen=3\n\n"
        "[Level]\nLabel=L\nName=L\n\n"
        "[Record]\nLabel=R\nName=R1\nRecordTypeValue='R01'\n\n"
        "[Item]\nLabel=First label\nLabel=Second label\nName=AA\nStart=4\nLen=1\n\n"
    )
    res = parse_dcf_text("fc", text)
    assert [i for i in res.items if i.get("Name") == "AA"][0]["Label"] == "First label"


def test_duplicate_record_name_conflicting_label_raises():
    text = (
        "[Dictionary]\nRecordTypeStart=1\nRecordTypeLen=3\n\n"
        "[Level]\nLabel=L\nName=L\n\n"
        "[Record]\nLabel=R one\nName=R1\nRecordTypeValue='R01'\n\n"
        "[Record]\nLabel=R other\nName=R1\nRecordTypeValue='R02'\n\n"
    )
    with pytest.raises(DcfParseError, match="duplicate record"):
        parse_dcf_text("fc", text)


def test_valueset_label_mismatch_warns(parsed):
    text = (
        "[Dictionary]\nRecordTypeStart=1\nRecordTypeLen=3\n\n"
        "[Level]\nLabel=L\nName=L\n\n"
        "[Record]\nLabel=R\nName=R1\nRecordTypeValue='R01'\n\n"
        "[Item]\nLabel=Age of respondent\nName=AA\nStart=4\nLen=1\n\n"
        "[ValueSet]\nLabel=Completely unrelated words\nName=AA_VS1\nValue=1;x\n\n"
    )
    res = parse_dcf_text("fc", text)
    assert any("does not match" in w for w in res.warnings)
    assert not parsed.warnings  # the well-formed fixture warns nothing


def test_two_valuesets_merge():
    """DCF_Parser.py:337-342: an item may carry two valueset chunks."""
    text = (
        "[Dictionary]\nRecordTypeStart=1\nRecordTypeLen=3\n\n"
        "[Level]\nLabel=L\nName=L\n\n"
        "[Record]\nLabel=R\nName=R1\nRecordTypeValue='R01'\n\n"
        "[Item]\nLabel=Code\nName=AA\nStart=4\nLen=1\n\n"
        "[ValueSet]\nLabel=Code\nName=AA_VS1\nValue=1;one\n\n"
        "[ValueSet]\nLabel=Code\nName=AA_VS2\nValue=2;two\n\n"
    )
    res = parse_dcf_text("fc", text)
    assert [(v["Value"], v["ValueDesc"]) for v in res.values] == [("1", "one"), ("2", "two")]


def test_parse_dcf_files_spark(spark, tmp_path):
    """A5 distributed: binaryFile + mapInPandas across files."""
    d = tmp_path / "dcfs"
    d.mkdir()
    (d / "511.TESTFC.DCF").write_text(DCF_TEXT)
    (d / "512.OTHERFC.DCF").write_text(DCF_TEXT.replace("TESTDICT", "OTHERDICT"))
    items, values, relations = parse_dcf_files(spark, str(d))
    icounts = {r["FileCode"]: r["count"] for r in items.groupBy("FileCode").count().collect()}
    assert set(icounts) == {"511.TESTFC", "512.OTHERFC"}
    assert icounts["511.TESTFC"] == icounts["512.OTHERFC"] > 0
    assert relations.count() == 4  # 2 per file
    assert values.filter("Name = 'HV006'").count() == 24  # 12 per file


def test_trailing_and_double_blank_lines_are_noops():
    """A DCF ending in blank lines (or with doubled separators) must parse
    identically to the canonical form — section closes may not replay."""
    from tests.fixtures_cspro import DCF_TEXT

    base = parse_dcf_text("TESTFC", DCF_TEXT)
    trailing = parse_dcf_text("TESTFC", DCF_TEXT + "\n\n\n")
    doubled = parse_dcf_text("TESTFC", DCF_TEXT.replace("\n\n", "\n\n\n"))
    for variant in (trailing, doubled):
        assert variant.items == base.items
        assert variant.values == base.values
        assert variant.relations == base.relations
