"""Data layer: vocab round-trip, synthetic fixtures, HDF5 reader, batcher."""

import numpy as np

from cvc_tpu.data.vocab import Vocabulary, BOS_ID, EOS_ID, PAD_ID, UNK_ID
from cvc_tpu.data.synthetic import make_synthetic_dataset, write_fixture_files
from cvc_tpu.data.datasets import load_hdf5_dataset
from cvc_tpu.data.pipeline import make_batches, num_batches
from tests.conftest import tiny_model_config


def test_vocab_encode_decode_roundtrip():
    v = Vocabulary.build(["a dog runs fast", "a cat runs"], min_count=1)
    ids, n = v.encode("a dog runs", seq_length=8)
    assert ids[0] == BOS_ID and ids[4] == EOS_ID and n == 4
    assert (ids[5:] == PAD_ID).all()
    assert v.decode_sequence(ids[None, :]) == ["a dog runs"]


def test_vocab_unk_and_truncation():
    v = Vocabulary.build(["a dog"], min_count=1)
    ids, n = v.encode("a zebra " * 10, seq_length=4)
    assert n == 5  # 4 words + EOS
    assert (ids[1:5] == np.array([v.wtoi["a"], UNK_ID, v.wtoi["a"], UNK_ID])).all()


def test_vocab_save_load(tmp_path):
    v = Vocabulary.build(["a dog runs"], min_count=1)
    p = str(tmp_path / "vocab.json")
    v.save(p)
    v2 = Vocabulary.load(p)
    assert v2.itow == v.itow


def test_synthetic_dataset_entities_ground_to_caption_words():
    ds = make_synthetic_dataset(num_images=8, num_regions=16, feat_dim=32,
                                seq_length=12, split="train", seed=0)
    assert len(ds) == 8
    for i in range(len(ds)):
        ex = ds.get(i)
        words = ex.captions[0].split()
        for e in ex.entities:
            assert words[e.word_idx] == ds.class_names[e.class_id]
            assert e.box.shape == (4,)


def test_fixture_roundtrip_through_hdf5(tmp_path):
    ds = make_synthetic_dataset(num_images=6, num_regions=16, feat_dim=32,
                                seq_length=12, split="train", seed=0)
    ff, af, vf = (str(tmp_path / n) for n in
                  ("feat.h5", "ann.json", "vocab.json"))
    write_fixture_files(ds, ff, af, vf, split="train")
    vocab = Vocabulary.load(vf)
    ds2 = load_hdf5_dataset(ff, af, vocab, split="train")
    assert len(ds2) == len(ds)
    ex, ex2 = ds.get(0), ds2.get(0)
    np.testing.assert_allclose(ex.features, ex2.features)
    np.testing.assert_allclose(ex.boxes, ex2.boxes)
    assert ex.captions == ex2.captions
    assert [e.word_idx for e in ex.entities] == [e.word_idx for e in ex2.entities]


def test_batcher_static_shapes_and_masks():
    mc = tiny_model_config(feat_dim=32, num_regions=16, seq_length=12)
    ds = make_synthetic_dataset(num_images=10, num_regions=20,  # > pad: truncate
                                feat_dim=32, seq_length=12, split="train", seed=0)
    batches = list(make_batches(ds, mc, batch_size=4, shuffle=True, seed=1,
                                drop_last=False, prefetch=2))
    assert len(batches) == num_batches(ds, 4, drop_last=False)
    S, T = mc.num_regions, mc.max_tokens
    for b in batches:
        assert b.feats.shape == (4, S, 32)
        assert b.box_geom.shape == (4, S, 5)
        assert b.tokens.shape == (4, T)
        assert (b.tokens[:, 0] == BOS_ID).all()
        # masks: supervised positions exclude BOS, include EOS
        assert (b.token_mask[:, 0] == 0).all()
        assert ((b.region_mask == 0) | (b.region_mask == 1)).all()
    # last batch may be padded; padded rows are marked invalid
    tail = batches[-1]
    assert tail.valid.sum() == 10 % 4 or tail.valid.sum() == 4


def test_video_padding_flattens_frames():
    from cvc_tpu.data.pipeline import pad_regions
    F, N, D = 3, 5, 8
    feats = np.ones((F, N, D), np.float32)
    boxes = np.tile(np.array([0.1, 0.1, 0.5, 0.5], np.float32), (F, N, 1))
    cls = np.ones((F, N), np.int32)
    f, g, c, m = pad_regions(feats, boxes, cls, num_frames=4, num_regions=8,
                             feat_dim=D)
    assert f.shape == (32, D) and g.shape == (32, 5)
    assert m.sum() == F * N  # only real slots masked in
    assert np.isclose(g[0, 4], 0.16, atol=1e-5)  # area appended


def test_num_workers_parity_and_order():
    """Multi-threaded assembly yields byte-identical batches in the same
    order as the single-thread path."""
    from tests.conftest import tiny_model_config
    mc = tiny_model_config(feat_dim=32, num_regions=16, seq_length=12)
    ds = make_synthetic_dataset(num_images=13, num_regions=16, feat_dim=32,
                                seq_length=12, split="train", seed=0)
    ref = list(make_batches(ds, mc, 4, shuffle=True, seed=3,
                            drop_last=False, prefetch=0))
    par = list(make_batches(ds, mc, 4, shuffle=True, seed=3,
                            drop_last=False, prefetch=2, num_workers=3))
    assert len(ref) == len(par)
    for a, b in zip(ref, par):
        np.testing.assert_array_equal(a.feats, b.feats)
        np.testing.assert_array_equal(a.tokens, b.tokens)
        np.testing.assert_array_equal(a.example_idx, b.example_idx)
        np.testing.assert_array_equal(a.valid, b.valid)


def test_decode_sequence_with_pos_skips_bos_exactly():
    """A generated BOS mid-stream is dropped from the sentence but must
    NOT shift later words' timestep indices (attention alignment)."""
    from cvc_tpu.data.vocab import BOS_ID, EOS_ID
    ds = make_synthetic_dataset(num_images=2, num_regions=8, feat_dim=16,
                                seq_length=8, split="train", seed=0)
    v = ds.vocab
    w = [i for i in range(4, 10)]
    ids = np.array([[w[0], BOS_ID, w[1], w[2], EOS_ID, 0]], np.int32)
    sents, pos = v.decode_sequence_with_pos(ids)
    assert len(sents[0].split()) == 3
    assert pos[0] == [0, 2, 3]  # BOS slot 1 skipped, indices preserved


def test_synthetic_refs_per_image():
    """COCO-style multi-reference captions: k caption variants per image,
    entities carry their caption index, and the pipeline iterates
    (image, caption) pairs like the reference DataLoader."""
    from cvc_tpu.data.synthetic import make_synthetic_dataset

    ds1 = make_synthetic_dataset(num_images=6, num_regions=12, feat_dim=32,
                                 seq_length=16, num_classes=12, seed=3,
                                 word_order="shuffled", unique_colors=True,
                                 refs_per_image=1)
    ds4 = make_synthetic_dataset(num_images=6, num_regions=12, feat_dim=32,
                                 seq_length=16, num_classes=12, seed=3,
                                 word_order="shuffled", unique_colors=True,
                                 refs_per_image=4)
    # refs=1 must be bit-identical to the historical single-ref world,
    # so extra refs only consume rng draws AFTER each image's caption 0:
    # image 0's caption 0 matches across k (later images legitimately
    # diverge because refs 1..k-1 advance the stream).
    assert ds4.get(0).captions[0] == ds1.get(0).captions[0]
    np.testing.assert_array_equal(ds4.get(0).features, ds1.get(0).features)
    for i in range(6):
        e1, e4 = ds1.get(i), ds4.get(i)
        assert len(e1.captions) == 1 and len(e4.captions) == 4
        cis = {ent.caption_idx for ent in e4.entities}
        assert cis == set(range(4))
        # every variant mentions the same class set
        sets = [set(w for w in c.split() if w.startswith("obj"))
                for c in e4.captions]
        assert all(s == sets[0] for s in sets)
        # per-caption entity word positions point at the class words
        for ent in e4.entities:
            words = e4.captions[ent.caption_idx].split()
            assert words[ent.word_idx].startswith("obj")

    from cvc_tpu.data.pipeline import make_batches
    cfg = tiny_model_config(feat_dim=32, num_regions=12, seq_length=16)
    n1 = sum(b.valid.sum() for b in make_batches(ds1, cfg, 4, shuffle=False,
                                                 seed=0, drop_last=False))
    n4 = sum(b.valid.sum() for b in make_batches(ds4, cfg, 4, shuffle=False,
                                                 seed=0, drop_last=False))
    assert n1 == 6 and n4 == 4 * n1


def test_prefetch_worker_error_propagates():
    """An assembly error in the prefetch thread must raise in the consumer,
    not end the epoch early (a swallowed error = silent data truncation)."""
    import pytest
    from cvc_tpu.data.synthetic import make_synthetic_dataset
    from cvc_tpu.data.pipeline import make_batches

    ds = make_synthetic_dataset(num_images=6, num_regions=12, feat_dim=32,
                                seq_length=12, split="train", seed=0)
    cfg = tiny_model_config(feat_dim=32, num_regions=12, seq_length=12)

    # Wrap the dataset so the 2nd example raises inside the worker thread.
    class FailingDS:
        vocab = ds.vocab

        def __len__(self):
            return len(ds)

        def get(self, i):
            if i == 1:
                raise RuntimeError("synthetic assembly failure")
            return ds.get(i)

    with pytest.raises(RuntimeError, match="synthetic assembly failure"):
        list(make_batches(FailingDS(), cfg, 4, shuffle=False, seed=0,
                          drop_last=False, prefetch=2))


def test_synthetic_ref_subset():
    """Coverage-slack world: with ref_subset each reference mentions a
    random subset of the objects (uniform 1..n_obj, per-ref), so the
    CIDEr-optimal caption (union coverage) differs from any single ref —
    the regime where sequence-level reward has slack over XE."""
    from cvc_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(num_images=24, num_regions=12, feat_dim=32,
                                seq_length=18, num_classes=12, seed=5,
                                word_order="shuffled", unique_colors=True,
                                refs_per_image=5, ref_subset=True)
    saw_partial = saw_varying = False
    for i in range(24):
        ex = ds.get(i)
        all_objs = set()
        per_ref = []
        for cap in ex.captions:
            objs = set(w for w in cap.split() if w.startswith("obj"))
            assert len(objs) >= 1
            per_ref.append(objs)
            all_objs |= objs
        # subsets of the union; at least some refs are strict subsets
        for objs in per_ref:
            assert objs <= all_objs
        if any(objs < all_objs for objs in per_ref):
            saw_partial = True
        if len({len(o) for o in per_ref}) > 1:
            saw_varying = True
        # entities still point at class words of their own caption
        for ent in ex.entities:
            words = ex.captions[ent.caption_idx].split()
            assert words[ent.word_idx].startswith("obj")
    assert saw_partial and saw_varying

    # default off: every ref mentions the full object set (old behavior)
    ds0 = make_synthetic_dataset(num_images=8, num_regions=12, feat_dim=32,
                                 seq_length=18, num_classes=12, seed=5,
                                 word_order="shuffled", unique_colors=True,
                                 refs_per_image=3)
    for i in range(8):
        sets = [set(w for w in c.split() if w.startswith("obj"))
                for c in ds0.get(i).captions]
        assert all(s == sets[0] for s in sets)


def test_synthetic_disk_cache_bit_identical(tmp_path, monkeypatch):
    """CVC_SYNTH_CACHE: second load comes from disk (generator not
    called) and is bit-identical to the generated dataset."""
    from cvc_tpu.config import Config
    from cvc_tpu.data import datasets as dsmod
    import cvc_tpu.data.synthetic as synth

    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_num_images = 6
    cfg.data.synthetic_vocab_size = 64
    cfg.data.seed = 3
    cfg.model.num_regions = 12
    cfg.model.feat_dim = 24
    cfg.model.seq_length = 12

    monkeypatch.setenv("CVC_SYNTH_CACHE", str(tmp_path))
    ds1 = dsmod.load_dataset(cfg.data, cfg.model, "train")
    files = list(tmp_path.glob("synth_*.pkl"))
    assert len(files) == 1 and not list(tmp_path.glob("*.tmp*"))

    real = synth.make_synthetic_dataset

    def boom(**kw):  # a second generation would be a cache miss
        raise AssertionError("generator called despite cache hit")

    monkeypatch.setattr(synth, "make_synthetic_dataset", boom)
    ds2 = dsmod.load_dataset(cfg.data, cfg.model, "train")
    assert len(ds2) == len(ds1)
    for i in range(len(ds1)):
        a, b = ds1.get(i), ds2.get(i)
        np.testing.assert_array_equal(a.features, b.features)
        np.testing.assert_array_equal(a.boxes, b.boxes)
        np.testing.assert_array_equal(a.classes, b.classes)
        assert a.captions == b.captions
    assert ds2.vocab.itow == ds1.vocab.itow

    # a different world (val split / different size) is a different key
    monkeypatch.setattr(synth, "make_synthetic_dataset", real)
    cfg.data.synthetic_num_val_images = 4
    ds3 = dsmod.load_dataset(cfg.data, cfg.model, "val")
    assert len(ds3) == 4
    assert len(list(tmp_path.glob("synth_*.pkl"))) == 2

def test_synthetic_noisy_world_attr_noise():
    """attr_noise resamples color WORDS only.  Self-contained check: the
    GT region's feature still encodes the TRUE color (argmax dot with
    the color directions), so the caption's color word should mismatch
    the feature-decoded color ~q*(C-1)/C of the time — and ~never at
    q=0.  Entity (class-word) annotations grade as before.  Zero-valued
    flags consume no RNG, so the generator stays bit-identical."""
    import numpy as np

    from cvc_tpu.data.synthetic import _COLORS

    kw = dict(num_images=40, num_regions=16, feat_dim=64, seq_length=16,
              num_classes=12, seed=5, word_order="shuffled",
              unique_colors=True)
    clean = make_synthetic_dataset(**kw)
    clean0 = make_synthetic_dataset(**kw, attr_noise=0.0,
                                    distractor_corr=0.0)
    for a, b in zip(clean.examples, clean0.examples):
        assert a.captions == b.captions
        assert np.array_equal(a.features, b.features)

    crng = np.random.default_rng(1234)
    centers = crng.normal(size=(12, 64)).astype(np.float32)
    centers *= 3.0 / np.linalg.norm(centers, axis=1, keepdims=True)
    color_dirs = crng.normal(size=(len(_COLORS), 64)).astype(np.float32)
    color_dirs *= 3.0 / np.linalg.norm(color_dirs, axis=1,
                                       keepdims=True)

    def flip_rate(ds):
        flips = total = 0
        for ex in ds.examples:
            words = ex.captions[0].split()
            for e in ex.entities:
                if e.caption_idx != 0 or e.word_idx - 1 < 0:
                    continue
                color_word = words[e.word_idx - 1]
                assert color_word in _COLORS
                assert words[e.word_idx] == f"obj{e.class_id}"
                slot = int(np.argmax(
                    [1.0 if int(c) == e.class_id else 0.0
                     for c in ex.classes]))
                true_col = int(np.argmax(ex.features[slot] @ color_dirs.T))
                total += 1
                flips += _COLORS[true_col] != color_word
        assert total > 80
        return flips / total

    assert flip_rate(clean) < 0.05
    noisy = make_synthetic_dataset(**kw, attr_noise=0.5)
    # q=0.5 with 8 colors -> expected mismatch ~0.5*(7/8) ~ 0.44
    assert 0.25 < flip_rate(noisy) < 0.6


def test_synthetic_noisy_world_distractor_corr():
    """distractor_corr pulls distractor features toward the image's
    true-object cluster centers; distractor CLASSES still exclude the
    image's objects (the v1 unlearnability guard), so grounding stays
    learnable — just with a thinner feature margin."""
    import numpy as np

    kw = dict(num_images=24, num_regions=16, feat_dim=64, seq_length=16,
              num_classes=12, seed=5, word_order="shuffled",
              unique_colors=True)
    clean = make_synthetic_dataset(**kw)
    corr = make_synthetic_dataset(**kw, distractor_corr=0.8)
    crng = np.random.default_rng(1234)
    centers = crng.normal(size=(12, 64)).astype(np.float32)
    centers *= 3.0 / np.linalg.norm(centers, axis=1, keepdims=True)

    def mean_true_dot(ds):
        dots = []
        for ex in ds.examples:
            true_cls = sorted({e.class_id for e in ex.entities})
            tc = centers[true_cls].mean(axis=0)
            d_slots = [i for i in range(ex.features.shape[0])
                       if int(ex.classes[i]) not in true_cls]
            dots.append(ex.features[d_slots] @ tc)
        return float(np.concatenate(dots).mean())

    for ex in corr.examples:
        true_cls = {e.class_id for e in ex.entities}
        # every true class still appears on exactly one region
        for c in true_cls:
            assert int(np.sum(ex.classes == c)) == 1
    assert mean_true_dot(corr) > mean_true_dot(clean) + 1.0
