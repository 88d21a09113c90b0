"""Vocabulary / place-recognition tests."""

import numpy as np

from gmmloc_tpu.vocab.bow import KeyFrameDatabase, Vocabulary


def corrupt(desc, rng, bits=6):
    out = desc.copy()
    for r in range(len(out)):
        for b in rng.integers(0, 256, bits):
            out[r, b >> 3] ^= np.uint8(1 << (b & 7))
    return out


def test_vocabulary_train_and_transform(rng):
    descs = rng.integers(0, 256, (2000, 32), dtype=np.uint8)
    voc = Vocabulary.train(descs, k=8, depth=3, seed=1)
    assert voc.n_words > 50
    words = voc.transform_words(descs[:100])
    assert ((words >= 0) & (words < voc.n_words)).all()
    # same descriptor -> same word; corrupted -> usually same word
    w2 = voc.transform_words(descs[:100])
    np.testing.assert_array_equal(words, w2)


def test_bow_similarity_discriminates(rng):
    base = rng.integers(0, 256, (3000, 32), dtype=np.uint8)
    voc = Vocabulary.train(base, k=8, depth=3, seed=2)
    scene_a = base[:300]
    scene_b = base[1000:1300]
    va = voc.bow_vector(scene_a)
    va2 = voc.bow_vector(corrupt(scene_a, rng))
    vb = voc.bow_vector(scene_b)
    same = Vocabulary.score_l1(va, va2)
    diff = Vocabulary.score_l1(va, vb)
    assert same > diff + 0.2, (same, diff)


def test_keyframe_database_query(rng):
    base = rng.integers(0, 256, (4000, 32), dtype=np.uint8)
    voc = Vocabulary.train(base, k=8, depth=3, seed=3)
    db = KeyFrameDatabase(voc)
    scenes = [base[i * 400 : (i + 1) * 400] for i in range(8)]
    for kf, sc in enumerate(scenes):
        db.add(kf, sc)
    # query with a corrupted view of scene 3
    res = db.query(corrupt(scenes[3], rng))
    assert res and res[0][0] == 3
    db.remove(3)
    res = db.query(corrupt(scenes[3], rng))
    assert not res or res[0][0] != 3


def test_vocabulary_save_load(rng, tmp_path):
    descs = rng.integers(0, 256, (1000, 32), dtype=np.uint8)
    voc = Vocabulary.train(descs, k=6, depth=3)
    p = str(tmp_path / "voc.npz")
    voc.save(p)
    voc2 = Vocabulary.load(p)
    np.testing.assert_array_equal(
        voc.transform_words(descs[:50]), voc2.transform_words(descs[:50])
    )
