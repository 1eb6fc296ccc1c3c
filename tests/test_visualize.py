import json

import numpy as np

from cvc_tpu.utils.visualize import (attention_summary, render_attention_png,
                                     save_attention_json)


def _data():
    words = ["a", "dog", "runs"]
    attn = np.array([[0.5, 0.5], [0.9, 0.1], [0.2, 0.8]])
    boxes = np.array([[0, 0, .5, .5], [.5, .5, 1, 1]], np.float32)
    return words, attn, boxes


def test_attention_summary_ranks_regions():
    words, attn, boxes = _data()
    s = attention_summary(words, attn, boxes, top_k=2)
    assert s[1]["word"] == "dog"
    assert s[1]["regions"][0]["slot"] == 0
    assert s[2]["regions"][0]["slot"] == 1


def test_save_json_and_png(tmp_path):
    words, attn, boxes = _data()
    jp = str(tmp_path / "a.json")
    save_attention_json(jp, "img1", words, attn, boxes)
    data = json.load(open(jp))
    assert data["caption"] == "a dog runs"
    ok = render_attention_png(str(tmp_path / "a.png"), words, attn, boxes,
                              object_words={"dog"})
    assert ok and (tmp_path / "a.png").exists()
