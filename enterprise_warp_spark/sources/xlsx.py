"""S8 — xlsx job-config source.

Reference: enterprise_warp.py:130 declares a ``job_config_xlsx:`` paramfile
label but never consumes it anywhere in the codebase; SURVEY §2 scoped S8
out on that basis. This module closes the gap anyway so a migrating user's
paramfile key actually does something: a pure-stdlib OOXML reader
(``zipfile`` + ``xml.etree``; no openpyxl in this environment) that loads
one worksheet into a Spark DataFrame.

Scale shape: a job config is a bounded driver-side artifact (like the
``pars.txt``/noise-JSON sidecars), so it is parsed on the driver and
shipped with ``createDataFrame`` — the same small-dimension contract as
J3/J7 lookup tables; join it broadcast. This reader is NOT for bulk data:
an xlsx is a single zip (not splittable), and anything row-heavy should be
parquet. A loud guard enforces that assumption.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_CELL_REF = re.compile(r"^([A-Z]+)(\d+)$")
# bounded-config guard: beyond this the file is data, not configuration
MAX_CONFIG_CELLS = 1_000_000


def _col_index(letters: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26 (base-26 bijective)."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _col_letters(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(data)
    out = []
    for si in root.iterfind(".//{*}si"):
        # plain <t> or rich-text runs <r><t>; itertext over the si node
        # concatenates both forms
        out.append("".join(t.text or "" for t in si.iterfind(".//{*}t")))
    return out


def _sheet_path(zf: zipfile.ZipFile, sheet: str | None) -> str:
    """Resolve a sheet name through workbook.xml -> workbook.xml.rels;
    None picks the first sheet."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_ns = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    targets = {
        rel.get("Id"): rel.get("Target") for rel in rels.iterfind(".//{*}Relationship")
    }
    names = []
    for sh in wb.iterfind(".//{*}sheet"):
        name, rid = sh.get("name"), sh.get(rid_ns)
        names.append(name)
        if sheet is None or name == sheet:
            target = targets[rid]
            return target if target.startswith("xl/") else f"xl/{target}"
    raise ValueError(f"sheet {sheet!r} not found; workbook has {names}")


def _cell_value(c: ET.Element, strings: list[str]) -> str | None:
    t = c.get("t", "n")
    if t == "inlineStr":
        node = c.find("{*}is")
        return "".join(x.text or "" for x in node.iterfind(".//{*}t")) if node is not None else ""
    v = c.find("{*}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return strings[int(v.text)]
    if t == "b":
        return "true" if v.text.strip() == "1" else "false"
    return v.text  # n / str / e — keep the literal; caller casts


def read_xlsx_rows(path: str, sheet: str | None = None) -> list[dict[str, str]]:
    """Worksheet -> list of {column-letter: value-string} dicts (driver
    side, bounded by MAX_CONFIG_CELLS)."""
    with zipfile.ZipFile(path) as zf:
        strings = _shared_strings(zf)
        root = ET.fromstring(zf.read(_sheet_path(zf, sheet)))
        rows: list[dict[str, str]] = []
        cells = 0
        default_col = 0
        for row in root.iterfind(".//{*}row"):
            rec: dict[str, str] = {}
            default_col = 0
            for c in row.iterfind(".//{*}c"):
                ref = c.get("r")
                if ref:
                    m = _CELL_REF.match(ref)
                    ci = _col_index(m.group(1)) if m else default_col
                else:  # cells without refs advance left-to-right
                    ci = default_col
                default_col = ci + 1
                val = _cell_value(c, strings)
                if val is not None:
                    rec[_col_letters(ci)] = val
                cells += 1
                if cells > MAX_CONFIG_CELLS:
                    raise ValueError(
                        f"{path}: > {MAX_CONFIG_CELLS} cells — this is bulk "
                        "data, not a job config; convert to parquet"
                    )
            rows.append(rec)
        return rows


def read_xlsx(
    spark: SparkSession,
    path: str,
    sheet: str | None = None,
    header: bool = True,
) -> DataFrame:
    """S8 — one worksheet as a DataFrame of STRING columns (config
    semantics: no type guessing; cast downstream). ``header=True`` takes
    the first row as column names; otherwise Excel letters name the
    columns."""
    from pyspark.sql.types import StringType, StructField, StructType

    rows = read_xlsx_rows(path, sheet)
    if not rows:
        return spark.createDataFrame([], "value string").limit(0)
    letters_used = sorted(
        {k for r in rows for k in r}, key=lambda s: (len(s), s)
    )
    if header:
        head, body = rows[0], rows[1:]
        names = [head.get(c, c) for c in letters_used]
    else:
        body, names = rows, letters_used
    # user-authored headers: empty cells fall back to the column letter,
    # duplicates get _2/_3 suffixes (a duplicate column name would make
    # every later select ambiguous); StructType avoids DDL-string escaping
    seen: dict[str, int] = {}
    uniq = []
    for letter, n in zip(letters_used, names):
        n = n.strip() or letter
        seen[n] = seen.get(n, 0) + 1
        uniq.append(n if seen[n] == 1 else f"{n}_{seen[n]}")
    data = [tuple(r.get(c) for c in letters_used) for r in body]
    schema = StructType([StructField(n, StringType()) for n in uniq])
    return spark.createDataFrame(data, schema)
