"""Text-classification datasets: 20NEWS / RCV1 bag-of-words graph signals.

Capability parity with the reference's text toolkit (lib/utils.py:13-218):
documents are cleaned, count-vectorized, filtered, and embedded so that a
kNN graph over word embeddings becomes the feature graph for ChebNet
classification (nips2016/20news.ipynb, rcv1.ipynb).

Differences from the reference, by necessity and by design:
* ``embed`` trains PPMI + truncated-SVD word vectors from the corpus
  itself (deterministic, dependency-free) instead of gensim word2vec
  (lib/utils.py:127-150 — gensim is unavailable here); pretrained vectors
  can be supplied via ``embeddings_from_file`` (word2vec binary format).
* dataset downloads are gated: this environment has no network egress, so
  ``Text20News``/``TextRCV1`` raise a clear error unless sklearn has a
  local copy; ``synthetic_text_dataset`` fabricates a corpus with the same
  interface for tests and benchmarks.
"""

from __future__ import annotations

import re

import numpy as np
import scipy.sparse

__all__ = [
    "TextDataset",
    "Text20News",
    "TextRCV1",
    "synthetic_text_dataset",
]


class TextDataset:
    """Bag-of-words dataset with cleaning / filtering / embedding steps.

    Attributes: ``documents`` (list[str]), ``labels`` (int array),
    ``class_names``, and after ``vectorize``: ``data`` (CSR [N, M]) and
    ``vocab`` (list[str]); after ``embed``: ``embeddings`` ([M, dim]).
    """

    documents: list
    labels: np.ndarray
    class_names: list
    data: scipy.sparse.csr_matrix
    vocab: list

    def clean_text(self, num: str = "substitute"):
        """Lowercase, strip non-letters, normalize digits
        (lib/utils.py:14-42)."""
        digit_words = ["zero", "one", "two", "three", "four",
                       "five", "six", "seven", "eight", "nine"]
        for i, doc in enumerate(self.documents):
            if num == "spell":
                for d, word in enumerate(digit_words):
                    doc = doc.replace(str(d), f" {word} ")
            elif num == "substitute":
                doc = re.sub(r"(\d+)", " NUM ", doc)
            elif num == "remove":
                doc = re.sub(r"[0-9]", " ", doc)
            doc = doc.replace("$", " dollar ")
            doc = doc.lower()
            doc = re.sub("[^a-z]", " ", doc)
            self.documents[i] = " ".join(doc.split())

    def vectorize(self, **params):
        import sklearn.feature_extraction.text

        vectorizer = sklearn.feature_extraction.text.CountVectorizer(**params)
        self.data = vectorizer.fit_transform(self.documents).tocsr()
        self.vocab = list(vectorizer.get_feature_names_out())
        assert len(self.vocab) == self.data.shape[1]

    def data_info(self, show_classes: bool = False):
        N, M = self.data.shape
        sparsity = self.data.nnz / N / M * 100
        print(f"N = {N} documents, M = {M} words, sparsity={sparsity:.4f}%")
        if show_classes:
            for i, name in enumerate(self.class_names):
                print(f"  {np.sum(self.labels == i):5d} documents in class "
                      f"{i:2d} ({name})")

    def show_document(self, i: int):
        """Print one document's label, word count, and nonzero counts
        (lib/utils.py:60-77)."""
        label = self.labels[i]
        name = self.class_names[label]
        text = self.documents[i] if hasattr(self, "documents") else None
        wc = len(text.split()) if text is not None else "N/A"
        print(f"document {i}: label {label} --> {name}, {wc} words")
        if hasattr(self, "data"):
            row = self.data[i]
            for j in row.nonzero()[1]:
                print(f"  {row[0, j]:.2f} \"{self.vocab[j]}\" ({j})")
        return text

    def keep_documents(self, idx):
        self.documents = [self.documents[i] for i in idx]
        self.labels = self.labels[idx]
        self.data = self.data[idx, :]

    def keep_words(self, idx):
        self.data = self.data[:, idx]
        self.vocab = [self.vocab[i] for i in idx]
        if hasattr(self, "embeddings"):
            self.embeddings = self.embeddings[idx, :]

    def remove_short_documents(self, nwords: int, vocab: str = "selected"):
        """Drop documents under ``nwords`` words (lib/utils.py:94-107)."""
        if vocab == "selected":
            wc = np.squeeze(np.asarray(self.data.sum(axis=1)))
        else:
            wc = np.array([len(d.split()) for d in self.documents])
        idx = np.flatnonzero(wc >= nwords)
        self.keep_documents(idx)
        return wc

    def keep_top_words(self, M: int, Mprint: int = 20):
        """Keep the M most frequent words (lib/utils.py:109-119)."""
        freq = np.squeeze(np.asarray(self.data.sum(axis=0)))
        idx = np.argsort(freq)[::-1][:M]
        self.keep_words(idx)
        for i in range(min(Mprint, len(self.vocab))):
            print(f"  {i:3d}: {self.vocab[i]:10s} {int(freq[idx][i]):6d} counts")
        return freq[idx]

    def normalize(self, norm: str = "l1"):
        import sklearn.preprocessing

        self.data = sklearn.preprocessing.normalize(
            self.data.astype(np.float64), axis=1, norm=norm
        )

    def embed(self, size: int = 100, window: int = 5, seed: int = 0):
        """Word embeddings from the corpus: PPMI co-occurrence + truncated
        SVD (a deterministic stand-in for the reference's gensim word2vec,
        lib/utils.py:127-150; both produce vectors whose kNN graph encodes
        distributional similarity)."""
        vocab_index = {w: i for i, w in enumerate(self.vocab)}
        M = len(self.vocab)
        rows, cols = [], []
        for doc in self.documents:
            ids = [vocab_index[w] for w in doc.split() if w in vocab_index]
            for i, wi in enumerate(ids):
                for wj in ids[max(0, i - window) : i]:
                    rows.append(wi), cols.append(wj)
                    rows.append(wj), cols.append(wi)
        if not rows:
            raise ValueError("no co-occurrences; did you call vectorize()?")
        C = scipy.sparse.coo_matrix(
            (np.ones(len(rows)), (rows, cols)), shape=(M, M)
        ).tocsr()

        # Positive pointwise mutual information.
        total = C.sum()
        wc = np.asarray(C.sum(axis=1)).ravel() + 1e-12
        C = C.tocoo()
        pmi = np.log(
            (C.data * total) / (wc[C.row] * wc[C.col])
        )
        pmi = np.maximum(pmi, 0)
        P = scipy.sparse.coo_matrix((pmi, (C.row, C.col)), shape=(M, M))

        k = min(size, M - 1)
        u, s, _ = scipy.sparse.linalg.svds(
            P.tocsr().astype(np.float64), k=k, rng=seed
        )
        self.embeddings = (u * np.sqrt(s)).astype(np.float32)
        return self.embeddings

    def embeddings_from_file(self, filename: str):
        """Load pretrained vectors in word2vec binary format; drops words
        without a vector (the reference's pretrained branch,
        lib/utils.py:129-131, 141-150)."""
        vectors = _read_word2vec_binary(filename)
        keep, emb = [], []
        for i, word in enumerate(self.vocab):
            if word in vectors:
                keep.append(i)
                emb.append(vectors[word])
        print(f"{len(self.vocab) - len(keep)} words not found in corpus")
        self.embeddings = np.asarray(emb, np.float32)
        self.keep_words(keep)
        return self.embeddings


class Text20News(TextDataset):
    """20 Newsgroups via sklearn (requires a local copy — no egress here;
    lib/utils.py:152-160)."""

    def __init__(self, **params):
        import sklearn.datasets

        try:
            dataset = sklearn.datasets.fetch_20newsgroups(
                download_if_missing=False, **params
            )
        except OSError as e:
            raise RuntimeError(
                "20NEWS is not cached locally and this environment has no "
                "network egress; place the sklearn cache under "
                "~/scikit_learn_data or use synthetic_text_dataset() for "
                "shape-compatible experiments"
            ) from e
        self.documents = list(dataset.data)
        self.labels = np.asarray(dataset.target)
        self.class_names = list(dataset.target_names)
        assert self.labels.max() + 1 == len(self.class_names)


class TextRCV1(TextDataset):
    """RCV1 via sklearn (103 categories; lib/utils.py:162-218)."""

    def __init__(self, **params):
        import sklearn.datasets

        try:
            dataset = sklearn.datasets.fetch_rcv1(
                download_if_missing=False, **params
            )
        except OSError as e:
            raise RuntimeError(
                "RCV1 is not cached locally and this environment has no "
                "network egress"
            ) from e
        self.data = dataset.data
        self.target = dataset.target
        self.class_names = list(dataset.target_names)
        assert len(self.class_names) == 103

    def remove_classes(self, keep):
        lookup = {name: i for i, name in enumerate(self.class_names)}
        idx = [lookup[name] for name in keep]
        self.target = self.target[:, idx]
        self.class_names = list(keep)

    def select_documents(self):
        """Keep single-label documents; labels from indicator columns
        (lib/utils.py:205-218)."""
        per_doc = np.asarray(self.target.sum(axis=1)).ravel()
        single = per_doc == 1
        self.target = self.target[single]
        self.data = self.data[single, :]
        self.labels = self.target.tocoo().col
        assert self.labels.min() == 0
        assert self.labels.max() == self.target.shape[1] - 1


def synthetic_text_dataset(
    n_docs: int = 400, vocab_size: int = 200, n_classes: int = 4,
    doc_len: int = 60, seed: int = 0,
) -> TextDataset:
    """Fabricated topic-model corpus with the TextDataset interface: each
    class prefers a distinct vocabulary band, so word embeddings cluster
    and the kNN word graph has exploitable structure."""
    rng = np.random.default_rng(seed)

    def word(i):  # purely alphabetic so clean_text() keeps words distinct
        letters = []
        for _ in range(4):
            letters.append(chr(ord("a") + i % 26))
            i //= 26
        return "w" + "".join(letters)

    words = [word(i) for i in range(vocab_size)]
    ds = TextDataset()
    ds.class_names = [f"class{i}" for i in range(n_classes)]
    ds.labels = rng.integers(0, n_classes, n_docs).astype(np.int64)
    band = vocab_size // n_classes
    docs = []
    for y in ds.labels:
        topic = np.full(vocab_size, 0.2 / vocab_size)
        topic[y * band : (y + 1) * band] += 0.8 / band
        ids = rng.choice(vocab_size, size=doc_len, p=topic / topic.sum())
        docs.append(" ".join(words[i] for i in ids))
    ds.documents = docs
    return ds


def _read_word2vec_binary(filename: str) -> dict:
    """Minimal word2vec .bin parser (replaces gensim's loader)."""
    vectors = {}
    with open(filename, "rb") as f:
        header = f.readline().split()
        n_words, dim = int(header[0]), int(header[1])
        for _ in range(n_words):
            word = b""
            while True:
                ch = f.read(1)
                if ch in (b" ", b""):
                    break
                if ch != b"\n":
                    word += ch
            vec = np.frombuffer(f.read(4 * dim), dtype=np.float32)
            vectors[word.decode("utf-8", errors="replace")] = vec
    return vectors
