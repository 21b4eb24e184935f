"""Demo CLI smoke test (subprocess, CPU, cropped fixtures)."""

import json
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_cli_end_to_end(tmp_path, left_image):
    from cudasift_tpu.utils.io import write_pgm, read_pgm
    import cv2

    righ = cv2.imread("/root/reference/data/righ.pgm", 0).astype(np.float32)
    lp = str(tmp_path / "l.pgm")
    rp = str(tmp_path / "r.pgm")
    # Corresponding crops (the pair is offset ~(-530, 16) px).
    write_pgm(lp, left_image[300:556, 600:984])
    write_pgm(rp, righ[284:540, 70:454])
    out = str(tmp_path / "annotated.pgm")

    proc = subprocess.run(
        [
            sys.executable, "-m", "cudasift_tpu.cli",
            "--platform", "cpu",
            "--left", lp, "--right", rp,
            "--octaves", "3", "--max-pts", "2048",
            "--num-loops", "512",
            "--out", out, "--json",
        ],
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    metrics = json.loads(proc.stdout.strip().splitlines()[-1])
    assert metrics["num_pts1"] > 100
    assert metrics["num_matches"] > 50
    annotated = read_pgm(out)
    assert annotated.shape == (256, 384)
    # Lines/boxes were drawn.
    assert (annotated == 255).sum() > 500
