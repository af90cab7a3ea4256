"""Multi-executor deployment shape (north rule: 'deployed via
spark-submit --py-files on multi-executor clusters').

Spins a REAL local-cluster[2,2,1024] — two executor JVMs separate from
the driver JVM, the smallest true multi-executor topology Spark can
run in one box — ships the package exactly the way spark-submit
--py-files would (a zip on spark.submit.pyFiles / addPyFile), and
asserts the extraction output is byte-identical to a plain local-mode
run of the same seeded corpus. This certifies the two things local[N]
can never exercise: (a) the package importing inside executor
processes that did NOT inherit the driver's sys.path, and (b) the
pandas-UDF Arrow path crossing a real driver->executor boundary.

Marked slow-ish: ~45 s for cluster spin-up + two tiny jobs; one test
carries the whole deployment seam.
"""

import pathlib
import subprocess
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def _package_zip(tmp_path: pathlib.Path) -> str:
    out = tmp_path / "dxnn_ocr_cpp_spark.zip"
    pkg = REPO / "dxnn_ocr_cpp_spark"
    with zipfile.ZipFile(out, "w") as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return str(out)


def test_extraction_identical_across_executor_jvms(tmp_path):
    # run in a subprocess so the local-cluster session can never
    # collide with the shared session other test modules hold
    script = f"""
import sys
sys.path.insert(0, {str(REPO)!r})
from dxnn_ocr_cpp_spark.corpus import generate_documents_df
from dxnn_ocr_cpp_spark.pipeline import extract
from dxnn_ocr_cpp_spark.session import build_session

def run(master, extra):
    s = build_session(app="mx-test", master=master,
                      shuffle_partitions=4, extra_conf=extra)
    if extra:
        s.sparkContext.addPyFile({_package_zip(tmp_path)!r})
    docs = generate_documents_df(s, 120, seed=11, partitions=6)
    rows = sorted((r["url"], r["text"], r["n_spans"])
                  for r in extract(docs).collect())
    s.stop()
    return rows

cluster = run("local-cluster[2,2,1024]",
              {{"spark.executor.memory": "1g",
                "spark.submit.pyFiles": {_package_zip(tmp_path)!r}}})
local = run("local[4]", None)
assert cluster == local, "multi-executor output diverged from local"
assert len(cluster) == 120
print("MX_OK", len(cluster))
"""
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True, timeout=280)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "MX_OK 120" in out.stdout
