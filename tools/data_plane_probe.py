"""Bytes-per-document census of the extraction data plane.

VERDICT r4 attributed the wide-window (8->32) scaling residual to the
data plane moving more bytes/doc than the bare extraction kernel; this
probe MEASURES each hop so the claim is a table, not an argument:

  hop 1  parquet scan        compressed bytes read per doc (url+html
                             columns only — the pruned scan)
  hop 2  decode              uncompressed parquet bytes per doc (what
                             the JVM materializes)
  hop 3  Arrow JVM->Python   serialized Arrow IPC bytes per doc of the
                             (url, html) batch the UDF receives
  hop 4  Arrow Python->JVM   serialized Arrow IPC bytes per doc of the
                             seg struct the UDF returns — measured for
                             BOTH the full BLOCK schema and BLOCK_SLIM
                             (the r5 diet: tag_path -> 1-byte boiler,
                             n_tags dropped)
  hop 5  final text          emitted bytes per doc

Run: python tools/data_plane_probe.py [n_docs]  (default 4000; no JVM —
Arrow sizes come from pyarrow IPC serialization of the exact schemas,
parquet sizes from the bench corpus metadata when present, else from
writing a sample).
"""

from __future__ import annotations

import glob
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def spark_to_arrow_schema(st):
    """Minimal StructType -> pyarrow schema for the fields used here
    (int/str/bool/double/binary + arrays of structs)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    def conv(dt):
        if isinstance(dt, T.IntegerType):
            return pa.int32()
        if isinstance(dt, T.StringType):
            return pa.string()
        if isinstance(dt, T.BooleanType):
            return pa.bool_()
        if isinstance(dt, T.DoubleType):
            return pa.float64()
        if isinstance(dt, T.BinaryType):
            return pa.binary()
        if isinstance(dt, T.ArrayType):
            return pa.list_(conv(dt.elementType))
        if isinstance(dt, T.StructType):
            return pa.struct([pa.field(f.name, conv(f.dataType))
                              for f in dt.fields])
        raise TypeError(dt)

    return pa.schema([pa.field(f.name, conv(f.dataType))
                      for f in st.fields])


def ipc_bytes(table) -> int:
    import pyarrow as pa
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return len(sink.getvalue())


def main(n_docs: int = 4000) -> dict:
    import pyarrow as pa

    from dxnn_ocr_cpp_spark.config import DEFAULT_CONFIG as cfg
    from dxnn_ocr_cpp_spark.corpus import make_document
    from dxnn_ocr_cpp_spark.operators.segment import segment_one
    from dxnn_ocr_cpp_spark.pipeline import extract_python
    from dxnn_ocr_cpp_spark.schemas import (SEGMENT_RESULT,
                                            SEGMENT_RESULT_SLIM)

    docs = [make_document(i, 42) for i in range(n_docs)]

    # hops 1+2: parquet bytes of the pruned (url, html) read — prefer
    # the real bench corpus metadata so codec/row-group choices show
    out: dict = {"n_docs": n_docs}
    corp = sorted(glob.glob(
        "/tmp/spark_graft_corpus/seed*/part-*.parquet"))
    if corp:
        import pyarrow.parquet as pq
        comp = uncomp = rows = 0
        for f in corp[:8]:
            md = pq.ParquetFile(f).metadata
            rows += md.num_rows
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for c in range(g.num_columns):
                    col = g.column(c)
                    if col.path_in_schema in ("url", "html"):
                        comp += col.total_compressed_size
                        uncomp += col.total_uncompressed_size
        out["parquet_scan_compressed_per_doc"] = round(comp / rows, 1)
        out["parquet_decoded_per_doc"] = round(uncomp / rows, 1)
        out["parquet_source"] = "bench corpus metadata"
    else:
        out["parquet_source"] = "absent (run bench once to populate)"

    # hop 3: Arrow IPC of (url, html) — what the UDF boundary receives
    t_in = pa.table({
        "url": pa.array([d["url"] for d in docs]),
        "html": pa.array([d["html"] for d in docs], type=pa.binary()),
    })
    out["arrow_jvm_to_py_per_doc"] = round(ipc_bytes(t_in) / n_docs, 1)

    # hop 4: Arrow IPC of the seg struct, full vs slim schema
    for name, slim, schema in (
            ("full", False, SEGMENT_RESULT),
            ("slim", True, SEGMENT_RESULT_SLIM)):
        segs = [segment_one(d["html"], cfg, slim=slim) for d in docs]
        t = pa.Table.from_pylist(segs,
                                 schema=spark_to_arrow_schema(schema))
        out[f"arrow_py_to_jvm_per_doc_{name}"] = \
            round(ipc_bytes(t) / n_docs, 1)

    # hop 5: emitted text
    texts = [extract_python(d["url"], d["html"], cfg)["text"]
             for d in docs]
    out["final_text_per_doc"] = round(
        sum(len(t.encode()) for t in texts) / n_docs, 1)

    full = out["arrow_py_to_jvm_per_doc_full"]
    slim = out["arrow_py_to_jvm_per_doc_slim"]
    out["return_leg_reduction"] = round(1 - slim / full, 4)
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    print(json.dumps(main(n), indent=1))
