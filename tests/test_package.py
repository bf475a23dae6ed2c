"""--py-files packaging: the dq.zip artifact must be reproducible and
sufficient on its own — executors import the engine from the shipped
archive, not from the repo checkout."""

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_is_reproducible_and_complete(tmp_path):
    sys.path.insert(0, REPO)
    from tools.package import build

    a = build(str(tmp_path / "a.zip"))
    b = build(str(tmp_path / "b.zip"))
    assert open(a, "rb").read() == open(b, "rb").read()
    names = zipfile.ZipFile(a).namelist()
    for mod in ("dataquality_spark/pipeline.py",
                "dataquality_spark/operators/curation.py",
                "dataquality_spark/functions/langid.py",
                "dataquality_spark/sources/io.py"):
        assert mod in names
    assert not any("__pycache__" in n or n.endswith(".pyc")
                   for n in names)


def test_pipeline_runs_from_zip_only(tmp_path):
    """Real --py-files semantics: a subprocess whose cwd is NOT the repo
    strips the repo from sys.path, puts only the zip on the driver path
    and ships it to python workers via addPyFile; the decision pipeline
    must run end-to-end."""
    sys.path.insert(0, REPO)
    from tools.package import build

    zip_path = build(str(tmp_path / "dq.zip"))
    probe = tmp_path / "probe.py"
    probe.write_text(f"""
import sys
sys.path = [p for p in sys.path if not p.rstrip('/').endswith('repo')]
sys.path.insert(0, {zip_path!r})          # driver-side import from zip
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master('local[2]')
         .appName('pyfiles-probe')
         .config('spark.sql.shuffle.partitions', '2')
         .getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
spark.sparkContext.addPyFile({zip_path!r})  # executor-side (--py-files)
from dataquality_spark import pipeline
df = spark.createDataFrame(
    [('https://a.example.org/1', '2024-01-02 03:04:05', None,
      'the quick brown fox jumps over the lazy dog and keeps running '
      'every day through the green field with many common words here',
      'en')] * 50,
    'url string, warc_ts string, html binary, text string, lang string'
).withColumn('warc_ts', F.col('warc_ts').cast('timestamp'))
out = pipeline.decisions(df)
rows = out.select('keep', F.size('rule_hits').alias('nh')).collect()
assert len(rows) == 50
print('ZIPRUN_OK', len(rows))
""")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run([sys.executable, str(probe)], cwd=str(tmp_path),
                       capture_output=True, text=True, timeout=420,
                       env=env)
    assert "ZIPRUN_OK 50" in r.stdout, r.stderr[-3000:]
