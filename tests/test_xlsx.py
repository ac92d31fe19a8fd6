"""S8 — xlsx job-config source (sources/xlsx.py). The fixture workbook is
built with stdlib zipfile/XML too, covering shared strings (plain and
rich-text runs), inline strings, numbers, booleans, missing cells, and
multi-sheet resolution. Reference: enterprise_warp.py:130 declares the
``job_config_xlsx:`` label without ever consuming it; here it loads."""

import os
import zipfile

import pytest

from enterprise_warp_spark.sources.xlsx import (
    _col_index,
    _col_letters,
    read_xlsx,
    read_xlsx_rows,
)

_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_RNS = ('xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships"')


def _write_xlsx(path, sheets: dict[str, str], shared: list[str]):
    """sheets: {name: sheetData XML}. Minimal-but-valid OOXML package."""
    sheet_tags = "".join(
        f'<sheet name="{n}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, n in enumerate(sheets)
    )
    rels = "".join(
        f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.'
        f'org/officeDocument/2006/relationships/worksheet" '
        f'Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(len(sheets))
    )
    sst = "".join(shared)
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
            'content-types"/>',
        )
        zf.writestr(
            "xl/workbook.xml",
            f'<workbook {_NS} {_RNS}><sheets>{sheet_tags}</sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            f'package/2006/relationships">{rels}</Relationships>',
        )
        zf.writestr(f"xl/sharedStrings.xml", f"<sst {_NS}>{sst}</sst>")
        for i, body in enumerate(sheets.values()):
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                f"<worksheet {_NS}><sheetData>{body}</sheetData></worksheet>",
            )


@pytest.fixture()
def workbook(tmp_path):
    p = str(tmp_path / "job.xlsx")
    shared = [
        "<si><t>psr</t></si>",
        "<si><t>nsamp</t></si>",
        # rich-text runs concatenate: 'red_noise'
        "<si><r><t>red_</t></r><r><t>noise</t></r></si>",
        "<si><t>J1832-0836</t></si>",
    ]
    main = (
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="s"><v>2</v></c><c r="D1" t="inlineStr">'
        "<is><t>use_gwb</t></is></c></row>"
        '<row r="2">'
        '<c r="A2" t="s"><v>3</v></c><c r="B2"><v>5000</v></c>'
        '<c r="C2"><v>1.5</v></c><c r="D2" t="b"><v>1</v></c></row>'
        # sparse row: only column B present
        '<row r="3"><c r="B3"><v>250</v></c></row>'
    )
    other = '<row r="1"><c r="A1" t="inlineStr"><is><t>alt</t></is></c></row>'
    _write_xlsx(p, {"jobs": main, "misc": other}, shared)
    return p


def test_col_letters_roundtrip():
    for i in (0, 1, 25, 26, 27, 51, 52, 701, 702):
        assert _col_index(_col_letters(i)) == i
    assert _col_letters(0) == "A" and _col_letters(26) == "AA"
    assert _col_letters(701) == "ZZ" and _col_letters(702) == "AAA"


def test_read_rows_types_and_sparsity(workbook):
    rows = read_xlsx_rows(workbook)
    assert rows[0] == {"A": "psr", "B": "nsamp", "C": "red_noise",
                       "D": "use_gwb"}
    assert rows[1] == {"A": "J1832-0836", "B": "5000", "C": "1.5",
                       "D": "true"}
    assert rows[2] == {"B": "250"}


def test_read_xlsx_dataframe(spark, workbook):
    df = read_xlsx(spark, workbook)
    assert df.columns == ["psr", "nsamp", "red_noise", "use_gwb"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 4
    got = [r.asDict() for r in df.collect()]
    assert got[0] == {"psr": "J1832-0836", "nsamp": "5000",
                      "red_noise": "1.5", "use_gwb": "true"}
    assert got[1] == {"psr": None, "nsamp": "250", "red_noise": None,
                      "use_gwb": None}


def test_read_xlsx_sheet_selection_and_no_header(spark, workbook):
    df = read_xlsx(spark, workbook, sheet="misc", header=False)
    assert df.columns == ["A"]
    assert df.first()["A"] == "alt"
    with pytest.raises(ValueError, match="not found"):
        read_xlsx_rows(workbook, sheet="nope")


def test_paramfile_label_and_run_integration(spark, tmp_path, workbook):
    """job_config_xlsx: is a TYPED paramfile label (not extra) and
    run_from_paramfile surfaces the loaded DataFrame."""
    from enterprise_warp_spark.plans import parse_paramfile

    dat = tmp_path / "x.dat"
    dat.write_text("job_config_xlsx: job.xlsx\ndatadir: d\n")
    p = parse_paramfile(str(dat))
    assert p.job_config_xlsx == "job.xlsx"
    assert "job_config_xlsx" not in p.extra
    # CLI path: reference example tree + the key appended
    import shutil

    base = tmp_path / "tree"
    for sub in ("data", "example_params", "example_noisemodels",
                "example_noisefiles"):
        shutil.copytree(os.path.join("/root/reference/examples", sub),
                        base / sub)
    prfile = base / "example_params" / "default_model_dynesty.dat"
    # relative paramfile paths resolve against the anchor dir (the tree
    # root, where datadir: resolves) — not the prfile's own directory
    shutil.copy(workbook, base / "job.xlsx")
    # global labels live BEFORE the first {N} model-scope header
    orig = prfile.read_text()
    prfile.write_text("job_config_xlsx: job.xlsx\n" + orig)
    from enterprise_warp_spark.run_paramfile import main

    out = main(["--prfile", str(prfile), "--num", "0"], spark=spark)
    jc = out["job_config"]
    assert jc is not None and jc.count() == 2
    assert jc.columns == ["psr", "nsamp", "red_noise", "use_gwb"]


def test_hostile_headers(spark, tmp_path):
    """Review fix: backtick headers must not break schema construction,
    duplicate headers get _N suffixes, empty headers fall back to the
    column letter."""
    p = str(tmp_path / "h.xlsx")
    body = (
        '<row r="1">'
        '<c r="A1" t="inlineStr"><is><t>a`b</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>psr</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t>psr</t></is></c>'
        '<c r="D1" t="inlineStr"><is><t> </t></is></c></row>'
        '<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>2</v></c>'
        '<c r="C2"><v>3</v></c><c r="D2"><v>4</v></c></row>'
    )
    _write_xlsx(p, {"s": body}, [])
    df = read_xlsx(spark, p)
    assert df.columns == ["a`b", "psr", "psr_2", "D"]
    r = df.first()
    assert (r["a`b"], r["psr"], r["psr_2"], r["D"]) == ("1", "2", "3", "4")


def test_xlsx_random_table_roundtrip():
    """Property: arbitrary small tables (mixed shared-string and numeric
    cells, ragged rows) survive write -> read_xlsx_rows byte-exactly."""
    import tempfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    cell = st.one_of(
        st.text(alphabet="abcXYZ 0-_", min_size=0, max_size=8),
        st.integers(min_value=-10**9, max_value=10**9),
        st.none(),
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.lists(cell, min_size=1, max_size=6), min_size=1,
                    max_size=8))
    def check(table):
        shared, sindex = [], {}
        rows_xml = []
        for ri, row in enumerate(table):
            cells = []
            for ci, v in enumerate(row):
                ref = f"{_col_letters(ci)}{ri + 1}"
                if v is None:
                    continue
                if isinstance(v, str):
                    if v not in sindex:
                        sindex[v] = len(shared)
                        shared.append(f"<si><t>{v}</t></si>")
                    cells.append(f'<c r="{ref}" t="s"><v>{sindex[v]}</v></c>')
                else:
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
            rows_xml.append(f'<row r="{ri + 1}">{"".join(cells)}</row>')
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "t.xlsx")
            _write_xlsx(p, {"s": "".join(rows_xml)}, shared)
            got = read_xlsx_rows(p)
        assert len(got) == len(table)
        for row, rec in zip(table, got):
            expect = {
                _col_letters(ci): (v if isinstance(v, str) else str(v))
                for ci, v in enumerate(row) if v is not None
            }
            assert rec == expect

    check()


def test_malformed_xlsx_raise_cleanly(tmp_path, workbook):
    """Corrupt packages must raise the zipfile/XML/ValueError family with
    a useful message — never hang or return partial garbage."""
    import xml.etree.ElementTree as ET

    # truncated zip
    data = open(workbook, "rb").read()
    trunc = tmp_path / "t.xlsx"
    trunc.write_bytes(data[: len(data) // 3])
    with pytest.raises((zipfile.BadZipFile, KeyError, ET.ParseError,
                        ValueError)):
        read_xlsx_rows(str(trunc))
    # not a zip at all
    notzip = tmp_path / "n.xlsx"
    notzip.write_bytes(b"this is not a zip file at all" * 10)
    with pytest.raises(zipfile.BadZipFile):
        read_xlsx_rows(str(notzip))
    # zip missing the workbook part
    empty = tmp_path / "e.xlsx"
    with zipfile.ZipFile(empty, "w") as zf:
        zf.writestr("unrelated.txt", "x")
    with pytest.raises(KeyError):
        read_xlsx_rows(str(empty))
    # shared-string index out of range
    bad = tmp_path / "b.xlsx"
    _write_xlsx(str(bad),
                {"s": '<row r="1"><c r="A1" t="s"><v>99</v></c></row>'}, [])
    with pytest.raises(IndexError):
        read_xlsx_rows(str(bad))


def test_empty_sheet_returns_empty_frame(spark, tmp_path):
    p = str(tmp_path / "z.xlsx")
    _write_xlsx(p, {"s": ""}, [])
    df = read_xlsx(spark, p)
    assert df.count() == 0
