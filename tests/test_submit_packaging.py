"""spark-submit packaging (SURVEY.md §7 M7): the --py-files zip must be
buildable and importable from a clean interpreter, exactly as an executor
would import it."""

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_build_zip_importable(tmp_path):
    sys.path.insert(0, REPO)
    import submit

    out = submit.build_zip(str(tmp_path / "dist" / "collector_spark.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "collector_spark/__init__.py" in names
    assert "collector_spark/operators/cel.py" in names
    assert not any("__pycache__" in n for n in names)

    # import the ORACLE (pure-Python module) from the zip in a clean
    # interpreter — proves executors can import the shipped package
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from collector_spark import oracle; "
        "print(oracle.shingle_hash('abc'))" % out
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert res.stdout.strip().isdigit()
