"""S10 export sinks: json / csv are stock writers; XML is implemented here.

The reference declares xml as a BulkExportRequest format
(app/models/response.py:149-156) but ships no serializer — so the contract
is ours to define, and it must hold at 100 TB: a single root-wrapped XML
document cannot shard, so the native format is **XML lines** (one complete
``<document>...</document>`` element per output line, parallel part files,
exactly like the jsonl the json sink emits). ``single_file=True`` adds the
root element for consumers that need one well-formed document — that
necessarily funnels through one task (coalesce(1)), the same trade every
engine makes for single-file exports.

Everything stays JVM-side: element assembly is one ``concat`` of escaped
column values; XML-escaping is a chain of ``regexp_replace`` (amp first).
No Python runs per row.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import Column, DataFrame


def xml_escape_col(col: "Column") -> "Column":
    """&, <, >, \", ' → entities; newline/CR → numeric character refs
    (&#10;/&#13;) so the one-element-per-LINE contract of the sharded
    sink survives multi-line values (extracted PDF text joins pages with
    '\\n'). Amp FIRST or it re-escapes the others; XML parsers restore
    the refs to the original characters on read."""
    out = F.regexp_replace(col, "&", "&amp;")
    for ch, ent in (("<", "&lt;"), (">", "&gt;"),
                    ('"', "&quot;"), ("'", "&apos;"),
                    ("\r", "&#13;"), ("\n", "&#10;")):
        out = F.regexp_replace(out, ch, ent)
    return out


def xml_row_col(df: "DataFrame", row_tag: str = "document") -> "Column":
    """One well-formed XML element per row: every column becomes a child
    element (cast to string, escaped); NULL columns are omitted, matching
    how the reference's json export drops absent fields."""
    parts = [F.lit(f"<{row_tag}>")]
    for c in df.columns:
        s = xml_escape_col(F.col(c).cast("string"))
        parts.append(
            F.when(
                F.col(c).isNotNull(),
                F.concat(F.lit(f"<{c}>"), s, F.lit(f"</{c}>")),
            ).otherwise(F.lit(""))
        )
    parts.append(F.lit(f"</{row_tag}>"))
    return F.concat(*parts)


def write_xml(
    df: "DataFrame",
    path: str,
    row_tag: str = "document",
    root_tag: str = "documents",
    single_file: bool = False,
) -> None:
    """XML export. Default: sharded XML-lines part files (scales — each
    task writes its own part, no root element). single_file=True: one
    well-formed document with a root element via coalesce(1) — fine for
    result-set-sized exports, not for table-sized ones."""
    lines = df.select(xml_row_col(df, row_tag).alias("value"))
    if single_file:
        header = df.sparkSession.createDataFrame(
            [(0, f"<?xml version=\"1.0\" encoding=\"UTF-8\"?><{root_tag}>")],
            "ord int, value string",
        )
        footer = df.sparkSession.createDataFrame(
            [(2, f"</{root_tag}>")], "ord int, value string"
        )
        body = lines.select(F.lit(1).alias("ord"), "value")
        (
            header.unionByName(body).unionByName(footer)
            .coalesce(1)
            .sortWithinPartitions("ord")
            .select("value")
            .write.mode("overwrite")
            .text(path)
        )
    else:
        lines.write.mode("overwrite").text(path)
