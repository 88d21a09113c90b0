"""Binary bag-of-words vocabulary + keyframe database.

TPU-native replacement for the DBoW2 capability surface
(ref: /root/reference/orb_dbow2/: TemplatedVocabulary k-ary tree,
TF-IDF BowVector, FeatureVector node buckets, L1 scoring;
gmmloc/src/cv/orb_vocabulary.cpp wrapper). Differences by design:

  - the pretrained ORBvoc.bin asset is absent from the reference repo
    (.MISSING_LARGE_BLOBS) and our descriptors are not OpenCV-ORB
    bit-compatible anyway, so the vocabulary is TRAINED (hierarchical
    k-medians with majority-vote binary centers) on descriptors from the
    target domain; save/load uses a simple npz container.
  - tree descent runs as one vmapped device kernel over all features
    (L fixed steps of k-child Hamming argmin), not a pointer walk.
  - within-keyframe BoW-accelerated matching is unnecessary on TPU (the
    full Hamming matrix is cheaper than bucketing — features/matching.py);
    the vocabulary exists for PLACE RECOGNITION: an inverted-index
    keyframe database with TF-IDF L1 scoring for relocalization — a
    capability extension the reference lacks (SURVEY.md §5.3).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _majority_center(descs: np.ndarray) -> np.ndarray:
    """Majority vote per bit (FORB::meanValue equivalent)."""
    bits = np.unpackbits(descs, axis=1)           # (n, 256)
    maj = (bits.sum(0) * 2 >= len(descs)).astype(np.uint8)
    return np.packbits(maj)


def _hamming_np(a, b):
    return np.unpackbits(a[:, None, :] ^ b[None, :, :], axis=-1).sum(-1)


class Vocabulary:
    """k-ary tree of binary centers, depth L; leaves are words."""

    def __init__(self, children: np.ndarray, node_desc: np.ndarray,
                 word_id: np.ndarray, word_weight: np.ndarray,
                 k: int, depth: int):
        self.children = children        # (n_nodes, k) int32, -1 = none
        self.node_desc = node_desc      # (n_nodes, 32) uint8
        self.word_id = word_id          # (n_nodes,) int32, -1 for inner
        self.word_weight = word_weight  # (n_words,) float32 idf
        self.k = k
        self.depth = depth
        self.n_words = len(word_weight)
        self._desc_fn = self._build_descend()

    # -------------------------------------------------------------- train

    @classmethod
    def train(cls, descs: np.ndarray, k: int = 10, depth: int = 4,
              seed: int = 0, kmeans_iters: int = 8) -> "Vocabulary":
        """Hierarchical binary k-medians (TemplatedVocabulary::create)."""
        rng = np.random.default_rng(seed)
        children_l: List[List[int]] = [[-1] * k]  # root = node 0
        desc_l: List[np.ndarray] = [np.zeros(32, np.uint8)]
        word_rows: List[int] = []

        def cluster(node: int, subset: np.ndarray, level: int):
            if level == depth or len(subset) <= k:
                # leaf: this node is a word
                word_rows.append(node)
                return
            # k-medians with majority-vote centers
            uniq = np.unique(subset, axis=0)
            kk = min(k, len(uniq))
            centers = uniq[rng.choice(len(uniq), kk, replace=False)]
            for _ in range(kmeans_iters):
                d = _hamming_np(subset, centers)
                assign = d.argmin(1)
                new_centers = []
                for c in range(kk):
                    sel = subset[assign == c]
                    new_centers.append(
                        _majority_center(sel) if len(sel) else centers[c]
                    )
                centers = np.stack(new_centers)
            d = _hamming_np(subset, centers)
            assign = d.argmin(1)
            for c in range(kk):
                child = len(desc_l)
                children_l.append([-1] * k)
                desc_l.append(centers[c])
                children_l[node][c] = child
                sel = subset[assign == c]
                if len(sel):
                    cluster(child, sel, level + 1)
                else:
                    word_rows.append(child)

        cluster(0, np.asarray(descs, np.uint8), 0)

        n_nodes = len(desc_l)
        children = np.full((n_nodes, k), -1, np.int32)
        for i, ch in enumerate(children_l):
            children[i] = ch
        node_desc = np.stack(desc_l)
        word_id = np.full(n_nodes, -1, np.int32)
        for w, node in enumerate(word_rows):
            word_id[node] = w
        # idf weights from the training corpus (uniform doc assumption)
        weight = np.ones(len(word_rows), np.float32)
        voc = cls(children, node_desc, word_id, weight, k, depth)
        # set idf from training descriptor distribution
        words = voc.transform_words(descs)
        counts = np.bincount(words[words >= 0], minlength=voc.n_words) + 1
        voc.word_weight = np.log(len(descs) / counts).astype(np.float32)
        return voc

    # ---------------------------------------------------------- transform

    def _build_descend(self):
        children = jnp.asarray(self.children)
        node_desc = jnp.asarray(self.node_desc)
        word_id = jnp.asarray(self.word_id)
        depth = self.depth
        k = self.k

        @jax.jit
        def descend(desc):
            """(N,32) uint8 -> (N,) word ids (-1 if lost)."""

            def step(node, _):
                ch = children[node]                        # (N, k)
                cd = node_desc[jnp.clip(ch, 0)]            # (N, k, 32)
                x = jax.lax.bitwise_xor(cd, desc[:, None, :])
                dist = jnp.sum(
                    jax.lax.population_count(x).astype(jnp.int32), axis=-1
                )
                dist = jnp.where(ch >= 0, dist, 1 << 20)
                nxt = jnp.take_along_axis(
                    ch, jnp.argmin(dist, axis=1)[:, None], axis=1
                )[:, 0]
                # stop at leaves (no children)
                has_child = jnp.any(children[node] >= 0, axis=1)
                return jnp.where(has_child, nxt, node), None

            node0 = jnp.zeros(desc.shape[0], jnp.int32)
            node, _ = jax.lax.scan(step, node0, None, length=depth)
            return word_id[node]

        return descend

    def transform_words(self, descs) -> np.ndarray:
        return np.asarray(self._desc_fn(jnp.asarray(descs, jnp.uint8)))

    def bow_vector(self, descs, valid=None) -> np.ndarray:
        """TF-IDF L1-normalized word histogram (n_words,)."""
        words = self.transform_words(descs)
        if valid is not None:
            words = words[np.asarray(valid)]
        words = words[words >= 0]
        v = np.zeros(self.n_words, np.float32)
        np.add.at(v, words, 1.0)
        v *= self.word_weight
        s = v.sum()
        return v / s if s > 0 else v

    @staticmethod
    def score_l1(a: np.ndarray, b: np.ndarray) -> float:
        """DBoW2 L1 score in [0,1] (ScoringObject.cpp L1Scoring)."""
        return float(1.0 - 0.5 * np.abs(a - b).sum())

    # ------------------------------------------------------------ save/load

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, children=self.children, node_desc=self.node_desc,
            word_id=self.word_id, word_weight=self.word_weight,
            k=self.k, depth=self.depth,
        )

    @classmethod
    def load(cls, path: str) -> "Vocabulary":
        z = np.load(path)
        return cls(
            z["children"], z["node_desc"], z["word_id"], z["word_weight"],
            int(z["k"]), int(z["depth"]),
        )


class KeyFrameDatabase:
    """Inverted-index place-recognition database (relocalization).

    Capability extension: the reference has no relocalization — a failed
    track simply ends the run (gmmloc.cpp:157-159, SURVEY.md §5.3).
    """

    def __init__(self, voc: Vocabulary):
        self.voc = voc
        self.inv: List[List[int]] = [[] for _ in range(voc.n_words)]
        self.bow: dict = {}

    def add(self, kf: int, descs, valid=None) -> None:
        v = self.voc.bow_vector(descs, valid)
        self.bow[kf] = v
        for w in np.where(v > 0)[0]:
            self.inv[w].append(kf)

    def remove(self, kf: int) -> None:
        v = self.bow.pop(kf, None)
        if v is None:
            return
        for w in np.where(v > 0)[0]:
            if kf in self.inv[w]:
                self.inv[w].remove(kf)

    def query(self, descs, valid=None, top: int = 5) -> List[Tuple[int, float]]:
        """Candidate KFs by shared words, scored TF-IDF L1.

        All keyframes sharing at least one word are scored (vectorized
        over the stacked BoW matrix). A share-count prefilter like
        ORB-SLAM2's 0.8*max cut degenerates when the vocabulary is small
        relative to the per-frame feature count (every KF shares nearly
        every word and a single KF monopolizes the candidate list)."""
        if not self.bow:
            return []
        v = self.voc.bow_vector(descs, valid)
        kfs = list(self.bow.keys())
        mat = np.stack([self.bow[k] for k in kfs])     # (n_kf, n_words)
        # L1 score: 2 + sum(|a-b| - |a| - |b|) over shared support
        # (DBoW2 ScoringObject.cpp L1Scoring, higher = more similar)
        scores = 1.0 - 0.5 * np.abs(mat - v[None, :]).sum(axis=1)
        order = np.argsort(-scores)[:top]
        return [(kfs[i], float(scores[i])) for i in order if scores[i] > 0.0]
