"""Minimal pure-stdlib ``.xlsx`` reader (SURVEY §2.1 S3).

The reference loads a tiny remote Excel lookup table — the social-object
nomenclature — with ``pd.read_excel`` (custom_search_extraction.py:92-94).
This container has no Excel engine (openpyxl/xlrd), so S3 is implemented
directly on the file format: an ``.xlsx`` is a zip of XML parts
(ECMA-376 / ISO 29500 SpreadsheetML). We parse exactly the parts needed
for a data table:

- ``xl/workbook.xml`` + ``xl/_rels/workbook.xml.rels`` — sheet order and
  name → part path (sheet file numbering is NOT sheet order);
- ``xl/sharedStrings.xml`` — the shared-string pool (``t="s"`` cells
  store indexes into it); rich-text runs are concatenated like pandas;
- ``xl/worksheets/sheetN.xml`` — rows of ``<c r="A1" t="..."><v>`` cells.

Scope: values only (no formula evaluation — a cached ``<v>`` is used if
present), good for the reference's use case of small dimension/lookup
tables that become the broadcast side of J1. Driver-side by design, like
the pandas original; a 100 TB tabular ingest would never arrive as xlsx.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree


def _local(tag: str) -> str:
    """Tag name without its XML namespace."""
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'BC12' -> 54 (base-26 letters prefix of the cell ref)."""
    idx = 0
    for ch in ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in ElementTree.fromstring(data):
        # concatenate all <t> runs: plain and rich-text strings alike
        out.append("".join(t.text or "" for t in si.iter() if _local(t.tag) == "t"))
    return out


def _sheet_parts(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet name, zip part path)] in workbook order, via the rels map."""
    rels = {}
    try:
        for rel in ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels")):
            target = rel.get("Target", "")
            if target.startswith("/"):
                target = target.lstrip("/")
            else:
                target = "xl/" + target
            rels[rel.get("Id")] = re.sub(r"/\./", "/", target)
    except KeyError:
        pass
    parts = []
    for el in ElementTree.fromstring(zf.read("xl/workbook.xml")).iter():
        if _local(el.tag) == "sheet":
            rid = next((v for k, v in el.attrib.items() if _local(k) == "id"), None)
            path = rels.get(rid)
            if path is None:  # rels missing: fall back to file numbering
                n = len(parts) + 1
                path = f"xl/worksheets/sheet{n}.xml"
            parts.append((el.get("name", f"sheet{len(parts) + 1}"), path))
    return parts


def _cell_value(cell: ElementTree.Element, shared: list[str]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        return "".join(
            el.text or "" for el in cell.iter() if _local(el.tag) == "t"
        )
    v = next((el.text for el in cell if _local(el.tag) == "v"), None)
    if v is None:
        return None
    if t == "s":
        return shared[int(v)]
    if t in ("str", "e"):
        return v
    if t == "b":
        return bool(int(v))
    # numeric: ints stay ints (pandas read_excel shows 1, not 1.0, for
    # integral columns once it downcasts; we decide per-value)
    f = float(v)
    return int(f) if f.is_integer() and "e" not in v.lower() else f


def read_xlsx(
    data: bytes, sheet: int | str = 0, header: bool = True
) -> tuple[list[str], list[list]]:
    """Parse one sheet of an xlsx byte blob -> (column names, row lists).

    ``sheet`` is a workbook-order index or a sheet name. With ``header``
    the first non-empty row provides the column names (like
    ``pd.read_excel``'s default); rows are padded/truncated to its width.
    """
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        shared = _shared_strings(zf)
        parts = _sheet_parts(zf)
        if isinstance(sheet, str):
            matches = [p for name, p in parts if name == sheet]
            if not matches:
                raise KeyError(f"no sheet named {sheet!r}; have {[n for n, _ in parts]}")
            part = matches[0]
        else:
            part = parts[sheet][1]
        raw_rows: list[list] = []
        for row in ElementTree.fromstring(zf.read(part)).iter():
            if _local(row.tag) != "row":
                continue
            cells: dict[int, object] = {}
            next_idx = 0
            for cell in row:
                if _local(cell.tag) != "c":
                    continue
                ref = cell.get("r")
                idx = _col_index(ref) if ref else next_idx
                next_idx = idx + 1
                cells[idx] = _cell_value(cell, shared)
            width = max(cells) + 1 if cells else 0
            raw_rows.append([cells.get(i) for i in range(width)])
    raw_rows = [r for r in raw_rows if any(v is not None for v in r)]
    if not raw_rows:
        return [], []
    if header:
        names = [str(v) if v is not None else f"col{i}" for i, v in enumerate(raw_rows[0])]
        body = raw_rows[1:]
    else:
        names = [f"col{i}" for i in range(len(raw_rows[0]))]
        body = raw_rows
    width = len(names)
    return names, [(r + [None] * width)[:width] for r in body]


def write_minimal_xlsx(headers: list[str], rows: list[list]) -> bytes:
    """Emit a minimal valid xlsx (inline strings, no styles) — used to
    build test fixtures without an Excel engine; also a K-side escape
    hatch for tiny exports."""

    def esc(s: str) -> str:
        return (
            str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    def cell(col: int, rownum: int, v) -> str:
        letters = ""
        c = col + 1
        while c:
            c, rem = divmod(c - 1, 26)
            letters = chr(ord("A") + rem) + letters
        ref = f"{letters}{rownum}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{esc(v)}</t></is></c>'

    lines = []
    for i, row in enumerate([headers] + rows, start=1):
        body = "".join(cell(j, i, v) for j, v in enumerate(row))
        lines.append(f'<row r="{i}">{body}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(lines)}</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()
