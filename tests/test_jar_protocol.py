"""Jar-protocol fixture replay (VERDICT r2 next-round #6): the METEOR and
SPICE jar drivers have never met a real JVM in this sandbox, so their
line/JSON protocols are regression-locked against a fake `java` binary
that replays golden transcripts of the pycocoevalcap protocols
(reference: `coco-caption/pycocoevalcap/meteor/meteor.py` and
`spice/spice.py`).  The fake *asserts* every request the driver writes,
so a protocol drift fails loudly before the drivers ever meet java.
"""

import json
import os
import stat
import subprocess
import sys

import pytest

FAKE_JAVA = r'''#!/usr/bin/env python3
"""Fake `java` replaying the METEOR/SPICE jar protocols for driver tests."""
import json, os, sys

argv = sys.argv[1:]


def fail(msg):
    with open(os.environ["FAKE_JAVA_ERR"], "a") as f:
        f.write(msg + "\n")
    sys.exit(3)


if "-stdio" in argv:
    # METEOR 1.5 protocol: argv must look like
    #   -jar -Xmx2G <jar> - - -stdio -l en -norm
    if argv[0] != "-jar" or not argv[1].startswith("-Xmx"):
        fail(f"bad meteor argv: {argv}")
    if argv[3:5] != ["-", "-"] or "-l" not in argv or "-norm" not in argv:
        fail(f"bad meteor argv tail: {argv}")
    golden = json.load(open(os.environ["FAKE_METEOR_TRANSCRIPT"]))
    for turn in golden:
        line = sys.stdin.readline()
        if line == "":
            fail(f"stdin closed early; expected {turn['expect']!r}")
        if line.rstrip("\n") != turn["expect"]:
            fail(f"request mismatch:\n got  {line.rstrip()!r}\n want "
                 f"{turn['expect']!r}")
        for resp in turn["respond"]:
            sys.stdout.write(resp + "\n")
            sys.stdout.flush()
    sys.exit(0)

# SPICE protocol: -Xmx8G -jar <jar> <input.json> -cache <dir> -out
#                 <output.json> -subset -silent
if not argv[0].startswith("-Xmx") or argv[1] != "-jar":
    fail(f"bad spice argv: {argv}")
in_path = argv[3]
if "-cache" not in argv or "-out" not in argv or "-subset" not in argv \
        or "-silent" not in argv:
    fail(f"bad spice argv tail: {argv}")
out_path = argv[argv.index("-out") + 1]
payload = json.load(open(in_path))
if not isinstance(payload, list):
    fail("spice input not a list")
results = []
for item in payload:
    if set(item) != {"image_id", "test", "refs"}:
        fail(f"spice item keys: {sorted(item)}")
    if not isinstance(item["refs"], list):
        fail("spice refs not a list")
    # deterministic fake score: unigram overlap of test vs first ref
    t = set(item["test"].split())
    r = set(item["refs"][0].split()) if item["refs"] else set()
    f1 = 2 * len(t & r) / max(len(t) + len(r), 1)
    results.append({"image_id": item["image_id"],
                    "scores": {"All": {"f": f1, "pr": 0.0, "re": 0.0}}})
json.dump(results, open(out_path, "w"))
'''


@pytest.fixture
def fake_java(tmp_path, monkeypatch):
    """Install a fake `java` on PATH + dummy jar files + err channel."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    java = bin_dir / "java"
    java.write_text(FAKE_JAVA)
    java.chmod(java.stat().st_mode | stat.S_IEXEC)
    # the fake script runs under whatever python3 is on PATH; make sure
    # the current interpreter's dir is there too
    monkeypatch.setenv(
        "PATH", f"{bin_dir}:{os.path.dirname(sys.executable)}:"
                f"{os.environ['PATH']}")
    err = tmp_path / "protocol_errors.txt"
    monkeypatch.setenv("FAKE_JAVA_ERR", str(err))
    meteor_jar = tmp_path / "meteor-1.5.jar"
    meteor_jar.write_bytes(b"fake")
    spice_jar = tmp_path / "spice-1.0.jar"
    spice_jar.write_bytes(b"fake")
    monkeypatch.setenv("CVC_METEOR_JAR", str(meteor_jar))
    monkeypatch.setenv("CVC_SPICE_JAR", str(spice_jar))
    return {"err": err, "tmp": tmp_path}


def test_meteor_jar_driver_protocol(fake_java, tmp_path, monkeypatch):
    """Replay the exact SCORE/EVAL line protocol of pycocoevalcap's
    meteor.py and check the driver's requests byte-for-byte."""
    from cvc_tpu.evaluation.meteor_jar import MeteorJar, jar_available
    cands = {"img1": "a red ball", "img2": "the blue dog runs"}
    refs = {"img1": ["a red ball", "a crimson sphere"],
            "img2": ["a blue dog running"]}
    golden = [
        {"expect": "SCORE ||| a red ball ||| a crimson sphere ||| "
                   "a red ball",
         "respond": ["3.0 3.0 3.0 3.0 1.0 3.0 3.0 1.0"]},
        {"expect": "SCORE ||| a blue dog running ||| the blue dog runs",
         "respond": ["4.0 4.0 2.0 4.0 1.0 2.0 2.0 1.0"]},
        {"expect": "EVAL ||| 3.0 3.0 3.0 3.0 1.0 3.0 3.0 1.0 ||| "
                   "4.0 4.0 2.0 4.0 1.0 2.0 2.0 1.0",
         "respond": ["0.98", "0.41", "0.695"]},
    ]
    tpath = tmp_path / "meteor_transcript.json"
    tpath.write_text(json.dumps(golden))
    monkeypatch.setenv("FAKE_METEOR_TRANSCRIPT", str(tpath))

    assert jar_available()
    jar = MeteorJar()
    corpus, per = jar.compute_score(cands, refs)
    jar.close()
    assert not fake_java["err"].exists(), fake_java["err"].read_text()
    assert corpus == pytest.approx(0.695)
    assert per == {"img1": pytest.approx(0.98), "img2": pytest.approx(0.41)}


def test_meteor_jar_driver_sanitizes_separators(fake_java, tmp_path,
                                                monkeypatch):
    """'|||' inside a caption must not corrupt the line protocol."""
    from cvc_tpu.evaluation.meteor_jar import MeteorJar
    golden = [
        {"expect": "SCORE ||| a ref ||| weird cand",
         "respond": ["1.0 1.0 1.0 1.0 1.0 1.0 1.0 1.0"]},
        {"expect": "EVAL ||| 1.0 1.0 1.0 1.0 1.0 1.0 1.0 1.0",
         "respond": ["0.5", "0.5"]},
    ]
    tpath = tmp_path / "t.json"
    tpath.write_text(json.dumps(golden))
    monkeypatch.setenv("FAKE_METEOR_TRANSCRIPT", str(tpath))
    jar = MeteorJar()
    corpus, _ = jar.compute_score({"i": "weird ||| cand"},
                                  {"i": ["a |||ref"]})
    jar.close()
    assert not fake_java["err"].exists(), fake_java["err"].read_text()
    assert corpus == pytest.approx(0.5)


def test_spice_jar_driver_protocol(fake_java):
    """The SPICE driver's argv + input/output JSON contract."""
    from cvc_tpu.evaluation import spice_jar
    assert spice_jar.jar_available()
    cands = {"a": "a red ball", "b": "a dog"}
    refs = {"a": ["a red ball on grass"], "b": ["a cat"]}
    mean, per = spice_jar.compute_spice(cands, refs)
    assert not fake_java["err"].exists(), fake_java["err"].read_text()
    # fake scores: unigram-overlap F1 vs first ref
    assert per["a"] == pytest.approx(2 * 3 / (3 + 5))
    assert per["b"] == pytest.approx(2 * 1 / (2 + 2))
    assert mean == pytest.approx((per["a"] + per["b"]) / 2)


def test_language_eval_engages_jars(fake_java, tmp_path, monkeypatch):
    """language_eval auto-selects the jar paths when java + jars exist —
    METEOR and SPICE both come from the (fake) jars."""
    golden = [
        {"expect": "SCORE ||| a red ball ||| a red ball",
         "respond": ["3.0 3.0 3.0 3.0 1.0 3.0 3.0 1.0"]},
        {"expect": "EVAL ||| 3.0 3.0 3.0 3.0 1.0 3.0 3.0 1.0",
         "respond": ["1.0", "1.0"]},
    ]
    tpath = tmp_path / "t.json"
    tpath.write_text(json.dumps(golden))
    monkeypatch.setenv("FAKE_METEOR_TRANSCRIPT", str(tpath))
    from cvc_tpu.evaluation.language_eval import language_eval
    preds = [{"image_id": "x", "caption": "a red ball"}]
    refs = {"x": ["a red ball"]}
    out = language_eval(preds, refs)
    assert not fake_java["err"].exists(), fake_java["err"].read_text()
    assert out["METEOR_source"] == "meteor-1.5.jar"
    assert out["METEOR"] == pytest.approx(1.0)
    assert out["SPICE_source"] == "spice-1.0.jar"
    assert out["SPICE"] == pytest.approx(1.0)


def test_meteor_port_synonym_stage():
    """The python port's synonym/paraphrase stages work when fed a table
    (they ship empty; VERDICT r2 asked for proof the hook functions)."""
    from cvc_tpu.evaluation.meteor import align, meteor_score
    syn = {"sofa": {"couch"}, "couch": {"sofa"}}
    pairs, weights = align("a sofa".split(), "a couch".split(),
                           synonyms=syn)
    assert (1, 1) in pairs
    assert weights[(1, 1)] == pytest.approx(0.8)   # synonym module weight
    # with the table, score strictly exceeds the no-table score
    s_with = meteor_score("a sofa", ["a couch"], synonyms=syn)
    s_without = meteor_score("a sofa", ["a couch"])
    assert s_with > s_without
    # paraphrase stage (weight 0.6) fires when synonyms don't
    para = {"auto": {"car"}}
    pairs2, weights2 = align("an auto".split(), "an car".split(),
                             paraphrases=para)
    assert (1, 1) in pairs2
    assert weights2[(1, 1)] == pytest.approx(0.6)


def test_builtin_synonym_table_fires_and_extends():
    """The curated built-in table makes the synonym stage fire by default
    (language_eval passes it to corpus_meteor), and an exchange file
    extends it (the WordNet-export hook)."""
    import os
    import tempfile

    from cvc_tpu.evaluation.meteor import meteor_score
    from cvc_tpu.evaluation.meteor_synonyms import load_synonyms

    syn = load_synonyms()
    assert "couch" in syn["sofa"] and "sofa" in syn["couch"]  # symmetric
    s_with = meteor_score("a large dog", ["a big dog"], synonyms=syn)
    s_without = meteor_score("a large dog", ["a big dog"])
    assert s_with > s_without

    with tempfile.NamedTemporaryFile("w", suffix=".txt",
                                     delete=False) as f:
        f.write("# comment line\nzorp blick\n")
        path = f.name
    try:
        ext = load_synonyms(path)
        assert "blick" in ext["zorp"]
        assert "couch" in ext["sofa"]  # built-ins retained
    finally:
        os.unlink(path)


def test_wordnet_export_roundtrip_env_var():
    """Round-trip a crafted 5-group WordNet-style exchange file through
    the deployment hook ($CVC_METEOR_SYNONYMS) and assert STAGE-LEVEL
    behavior: every within-group pair aligns at the synonym-module
    weight (0.8), across-group pairs don't, and normalization (case,
    comments, one-word lines) matches the documented format
    (VERDICT r3 #7; reference: coco-caption METEOR data files)."""
    import os
    import tempfile

    from cvc_tpu.evaluation.meteor import align
    from cvc_tpu.evaluation.meteor_synonyms import load_synonyms

    groups = [
        "zorp blick frum",          # 3-word group
        "QUINE Gavagai",            # case-normalized
        "snark boojum",
        "wug wugs",                 # inflection pair, as WordNet exports
        "florp gleep",
    ]
    body = "# wordnet export fixture\n" + "\n".join(groups) + \
        "\nsingleton\n"             # <2 words: must be ignored
    with tempfile.NamedTemporaryFile("w", suffix=".syn",
                                     delete=False) as f:
        f.write(body)
        path = f.name
    old = os.environ.get("CVC_METEOR_SYNONYMS")
    try:
        os.environ["CVC_METEOR_SYNONYMS"] = path
        load_synonyms.cache_clear()   # env var is read at load time
        syn = load_synonyms()
        # group membership: symmetric, non-transitive across groups
        for g in groups:
            words = g.lower().split()
            for w in words:
                assert syn[w] >= set(words) - {w}, (w, syn[w])
        assert "snark" not in syn["zorp"]
        assert "singleton" not in syn
        # stage level: within-group pair aligns with synonym weight 0.8
        pairs, weights = align("a zorp here".split(),
                               "a frum here".split(), synonyms=syn)
        assert (1, 1) in pairs and weights[(1, 1)] == 0.8
        pairs2, weights2 = align("the quine".split(),
                                 "the gavagai".split(), synonyms=syn)
        assert (1, 1) in pairs2 and weights2[(1, 1)] == 0.8
        # across groups: no synonym alignment
        pairs3, _ = align(["zorp"], ["boojum"], synonyms=syn)
        assert pairs3 == []
        # built-in curated groups still extend, not replace
        assert "couch" in syn["sofa"]
    finally:
        if old is None:
            os.environ.pop("CVC_METEOR_SYNONYMS", None)
        else:
            os.environ["CVC_METEOR_SYNONYMS"] = old
        load_synonyms.cache_clear()
        os.unlink(path)
