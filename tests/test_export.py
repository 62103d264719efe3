"""C11 format_file_size parity with the reference algorithm, and the S10
XML export sink (escaping, null omission, well-formedness, single-file)."""

import glob
import xml.etree.ElementTree as ET

from pyspark.sql import functions as F


def _reference_format_file_size(size_bytes):
    """Verbatim reimplementation of reference file_utils.py:188-206 used
    as the oracle for the column expression."""
    if size_bytes == 0:
        return "0B"
    size_names = ["B", "KB", "MB", "GB", "TB"]
    i = 0
    while size_bytes >= 1024 and i < len(size_names) - 1:
        size_bytes /= 1024.0
        i += 1
    return f"{size_bytes:.1f}{size_names[i]}"


class TestFormatFileSize:
    def test_matches_reference_values(self, spark):
        from medical_vector_database_ocr_ner_spark.functions.columns import (
            format_file_size_col,
        )

        sizes = [0, 1, 500, 1023, 1024, 1536, 2304, 10_000, 1024**2,
                 5 * 1024 + 256,  # 5.25 KB: exact dyadic tie → half-even
                 5 * 1024**2 + 123, 1024**3, 1024**4, 5 * 10**12,
                 1024**5, 123_456_789_012_345]
        df = spark.createDataFrame([(s,) for s in sizes], "size bigint")
        got = {
            r["size"]: r["fmt"]
            for r in df.select(
                "size", format_file_size_col(F.col("size")).alias("fmt")
            ).collect()
        }
        for s in sizes:
            assert got[s] == _reference_format_file_size(s), s

    def test_tb_is_the_cap(self, spark):
        from medical_vector_database_ocr_ner_spark.functions.columns import (
            format_file_size_col,
        )

        df = spark.createDataFrame([(1024**5 * 3,)], "size bigint")
        val = df.select(format_file_size_col(F.col("size")).alias("f")).first()["f"]
        assert val.endswith("TB") and val == "3072.0TB"


class TestXmlExport:
    def _df(self, spark):
        return spark.createDataFrame(
            [
                (1, "plain text\nsecond line", "en"),
                (2, 'needs <escaping> & "quotes" \'too\'', "de"),
                (3, None, "fr"),  # null column omitted
            ],
            "doc_id int, text string, lang string",
        )

    def test_xml_lines_roundtrip(self, spark, tmp_path):
        from medical_vector_database_ocr_ner_spark.sources.export import write_xml

        out = str(tmp_path / "xml")
        write_xml(self._df(spark), out)
        lines = []
        for p in glob.glob(f"{out}/part-*"):
            with open(p) as f:
                lines += [ln for ln in f.read().splitlines() if ln]
        assert len(lines) == 3
        by_id = {}
        for ln in lines:
            el = ET.fromstring(ln)  # each line parses standalone
            assert el.tag == "document"
            by_id[int(el.findtext("doc_id"))] = el
        assert by_id[2].findtext("text") == \
            'needs <escaping> & "quotes" \'too\''
        # newline survives as &#10; — element stays on ONE physical line
        # and parses back to the original value
        assert by_id[1].findtext("text") == "plain text\nsecond line"
        assert by_id[3].find("text") is None  # null omitted
        assert by_id[3].findtext("lang") == "fr"

    def test_single_file_well_formed(self, spark, tmp_path):
        from medical_vector_database_ocr_ner_spark.sources.export import write_xml

        out = str(tmp_path / "one")
        write_xml(self._df(spark), out, single_file=True)
        parts = glob.glob(f"{out}/part-*")
        assert len(parts) == 1
        with open(parts[0]) as f:
            doc = f.read()
        root = ET.fromstring(doc)
        assert root.tag == "documents"
        assert len(root.findall("document")) == 3


class TestPagesGenDataSource:
    """Custom Python DataSource (sources/pygen.py): a real
    spark.read.format source — schema, partition-parallel generation,
    deterministic re-read, and downstream source-agnosticism."""

    def test_read_schema_count_and_determinism(self, spark):
        from pyspark.sql import functions as F

        from medical_vector_database_ocr_ner_spark.sources.pygen import (
            register,
        )

        register(spark)
        df = (
            spark.read.format("pages_gen")
            .option("n", 120).option("numPartitions", 5).load()
        )
        assert [f.name for f in df.schema.fields] == [
            "url", "warc_ts", "html", "lang"
        ]
        assert df.count() == 120
        # partition-parallel: 5 input partitions, each generating only
        # its contiguous id range
        parts = (
            df.withColumn("p", F.spark_partition_id())
            .groupBy("p").count().collect()
        )
        assert len(parts) == 5
        assert sorted(r["count"] for r in parts) == [24] * 5
        # determinism contract: a second read is byte-identical
        df2 = (
            spark.read.format("pages_gen")
            .option("n", 120).option("numPartitions", 5).load()
        )
        a = sorted((r["url"], r["warc_ts"], bytes(r["html"]))
                   for r in df.collect())
        b = sorted((r["url"], r["warc_ts"], bytes(r["html"]))
                   for r in df2.collect())
        assert a == b
        assert len({u for u, _, _ in a}) == 120  # urls unique

    def test_downstream_is_source_agnostic(self, spark):
        # the generated pages run through the REAL extraction DAG —
        # the source swap is invisible downstream of spark.read
        from medical_vector_database_ocr_ner_spark.operators.extraction import (
            extract_documents,
        )
        from medical_vector_database_ocr_ner_spark.sources.pygen import (
            register,
        )

        register(spark)
        pages = (
            spark.read.format("pages_gen")
            .option("n", 40).option("numPartitions", 2).load()
        )
        docs = extract_documents(pages)
        rows = docs.collect()
        assert len(rows) == 40
        ok = [r for r in rows if r["status"] == "completed"]
        assert len(ok) == 40  # all synthetic pages extract cleanly
        assert all(r["extracted_text"] for r in ok)
