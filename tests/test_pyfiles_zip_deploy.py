"""spark-submit --py-files deployment shape, actually exercised (north
rule: "runs via spark-submit --py-files on multi-executor clusters").

README documents `zip -r kie_kg.zip kie_invoice_minimal_spark` +
`spark-submit --py-files kie_kg.zip ...`; this test PROVES the package
works that way: it builds the zip, then runs the flagship pipeline in a
SUBPROCESS whose only route to the package is the zip on PYTHONPATH —
covering (a) driver-side import from a zip, (b) executor python workers
unpickling the Arrow detector against the zip-imported module (the
py-files property that actually breaks when code sneaks in __file__
resource loads), and (c) the resume manifest's archive-hash fallback
(os.walk yields nothing inside a zip; the fingerprint must come from the
archive bytes, not degrade to a constant)."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER = """
import sys
import kie_invoice_minimal_spark as pkg
assert ".zip" in pkg.__file__, f"package not loaded from the zip: {pkg.__file__}"
from kie_invoice_minimal_spark.session import get_spark
from kie_invoice_minimal_spark.sources.transcripts import synth_transcripts
from kie_invoice_minimal_spark.plans.pipeline import extract_triples_df
from kie_invoice_minimal_spark.sources.checkpoints import engine_code_fingerprint

spark = get_spark(app_name="zip-deploy-test", master="local[2]", shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
t = synth_transcripts(spark, 200)
n_native = extract_triples_df(t, engine="native").count()
n_arrow = extract_triples_df(t, engine="arrow").count()  # workers import from zip
fp1 = engine_code_fingerprint()
fp2 = engine_code_fingerprint()
assert fp1 == fp2 and len(fp1) == 32
print("ZIPRUN", n_native, n_arrow, fp1)
"""


def test_package_runs_from_pyfiles_zip(tmp_path):
    zpath = str(tmp_path / "kie_kg.zip")
    pkg_dir = os.path.join(REPO, "kie_invoice_minimal_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in sorted(os.walk(pkg_dir)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    z.write(p, os.path.relpath(p, REPO))

    env = dict(os.environ)
    env["PYTHONPATH"] = zpath  # the ONLY route to the package
    env.pop("SPARK_GRAFT_CPUS", None)
    out = subprocess.run(
        [sys.executable, "-c", _DRIVER],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # repo dir NOT on sys.path
        env=env,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("ZIPRUN")][-1]
    _, n_native, n_arrow, fp = line.split()
    assert int(n_native) == int(n_arrow) > 0
    # archive-hash fallback engaged: the fingerprint must differ from the
    # directory-walk fingerprint of the in-repo package (different bytes
    # hashed), yet still be a stable 32-hex value
    from kie_invoice_minimal_spark.sources.checkpoints import (
        engine_code_fingerprint,
    )

    assert len(fp) == 32 and fp != engine_code_fingerprint()
