"""SPICE jar driver — used when a JVM and spice-1.0.jar are available.

SPICE parses candidate and reference captions into scene graphs with a
Java dependency parser and F-scores the graph tuples; there is no
credible pure-Python reimplementation without the parser, so WITHOUT a
JVM the framework reports SPICE as None rather than faking it
(language_eval.py).  WITH a JVM, this driver speaks the exact protocol
of pycocoevalcap's spice.py (reference: `coco-caption/pycocoevalcap/
spice/spice.py`): write an input JSON of
  [{"image_id", "test", "refs": [...]}]
run  `java -jar spice-*.jar input.json -cache <dir> -out output.json
-subset -silent`,  and read per-image + mean scores from the output
JSON.  Set $CVC_SPICE_JAR to the jar path."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile


def find_spice_jar() -> str | None:
    p = os.environ.get("CVC_SPICE_JAR")
    if p and os.path.exists(p):
        return p
    return None


def jar_available() -> bool:
    return shutil.which("java") is not None and find_spice_jar() is not None


def compute_spice(candidates: dict[str, str],
                  references: dict[str, list[str]],
                  jar: str | None = None, mem: str = "8G"
                  ) -> tuple[float, dict[str, float]]:
    """Returns (mean SPICE F-score, {image_id: F-score})."""
    jar = jar or find_spice_jar()
    if jar is None:
        raise RuntimeError("no SPICE jar (set CVC_SPICE_JAR)")
    ids = list(candidates.keys())
    payload = [{"image_id": i, "test": candidates[i],
                "refs": list(references[i])} for i in ids]
    with tempfile.TemporaryDirectory() as td:
        in_path = os.path.join(td, "input.json")
        out_path = os.path.join(td, "output.json")
        cache = os.path.join(td, "cache")
        os.makedirs(cache, exist_ok=True)
        with open(in_path, "w") as f:
            json.dump(payload, f)
        subprocess.run(
            ["java", f"-Xmx{mem}", "-jar", jar, in_path,
             "-cache", cache, "-out", out_path, "-subset", "-silent"],
            check=True, cwd=os.path.dirname(os.path.abspath(jar)),
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        with open(out_path) as f:
            results = json.load(f)
    per = {str(r["image_id"]): float(r["scores"]["All"]["f"])
           for r in results}
    mean = sum(per.values()) / max(len(per), 1)
    return mean, per
