"""Pure-python byte-pair-encoding tokenizer for the bench corpus.

Round-3 verdict item #9: every TPU number previously rode an md5 word-hash
"tokenizer" (1 token/word, uniform ids), so corpus-replay acceptance was
hash-faithful, not text-faithful. This module trains a small BPE vocab
OFFLINE on the checked-in benchmarks/corpus.txt (no downloads — the
environment has no HF vocab on disk) and bench.py / eval_datasets.py encode
with it, so draft-acceptance statistics ride a real subword stream with
realistic token repetition (the reference measures acceptance over a real
Llama2 tokenization of Dolly — lookahead/benchmarks/benchmark.py:243).

Scheme: standard lower-byte BPE over whitespace-split words with an
end-of-word marker (the GPT-2/sentencepiece word-boundary convention,
independently implemented). Ids 0..9 are reserved for specials to match the
bench's existing id floor.

Train + persist (committed as benchmarks/bpe_vocab.json):
    python benchmarks/bpe.py train [n_merges]
"""

from __future__ import annotations

import collections
import json
import os

EOW = "▁"  # end-of-word marker (rendered after the word's last char)
ID_FLOOR = 10  # ids 0..9 reserved (pad/eos/specials in bench configs)


def train_bpe(text: str, n_merges: int = 4000):
    """Learn merge ranks from text. Returns (merges, vocab) where merges is
    a list of (a, b) symbol pairs in rank order and vocab maps symbol->id."""
    words = collections.Counter(text.split())
    # each distinct word as a tuple of symbols
    seqs = {w: tuple(w) + (EOW,) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, seq in seqs.items():
            c = words[w]
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if cnt < 2:
            break  # merging singletons only bloats the vocab
        merges.append((a, b))
        ab = a + b
        new_seqs = {}
        for w, seq in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs[w] = tuple(out)
        seqs = new_seqs
    # vocab: all base chars seen + every merge product, stable order
    symbols = sorted({ch for w in words for ch in w} | {EOW})
    symbols += [a + b for a, b in merges]
    vocab = {s: ID_FLOOR + i for i, s in enumerate(symbols)}
    return merges, vocab


class BPETokenizer:
    """Encode text with a trained merge table. Greedy lowest-rank-first
    merging (the standard BPE encode); per-word LRU via a plain dict."""

    def __init__(self, merges, vocab):
        self.ranks = {tuple(m): r for r, m in enumerate(merges)}
        self.vocab = dict(vocab)
        self.inv = {i: s for s, i in self.vocab.items()}
        self._cache: dict = {}

    @property
    def n_ids(self) -> int:
        return ID_FLOOR + len(self.vocab)

    def _encode_word(self, w: str):
        if w in self._cache:
            return self._cache[w]
        seq = list(w) + [EOW]
        while len(seq) > 1:
            best, bi = None, -1
            for i in range(len(seq) - 1):
                r = self.ranks.get((seq[i], seq[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            seq[bi : bi + 2] = [seq[bi] + seq[bi + 1]]
        unk = ID_FLOOR  # unseen base char -> first symbol id (corpus-closed)
        ids = [self.vocab.get(s, unk) for s in seq]
        self._cache[w] = ids
        return ids

    def encode(self, text: str):
        out = []
        for w in text.split():
            out.extend(self._encode_word(w))
        return out

    def decode(self, ids) -> str:
        return "".join(self.inv.get(i, "?") for i in ids).replace(EOW, " ")

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(
                {"merges": [list(m) for m in self.ranks], "vocab": self.vocab},
                f,
            )

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        with open(path) as f:
            d = json.load(f)
        merges = [tuple(m) for m in d["merges"]]
        return cls(merges, d["vocab"])


VOCAB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bpe_vocab.json")
CORPUS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "corpus.txt")


def load_default() -> "BPETokenizer":
    return BPETokenizer.load(VOCAB_PATH)


if __name__ == "__main__":
    import sys

    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    text = open(CORPUS_PATH).read()
    merges, vocab = train_bpe(text, n)
    tok = BPETokenizer(merges, vocab)
    ids = tok.encode(text)
    words = len(text.split())
    print(f"merges={len(merges)} vocab={len(vocab)} ids/word="
          f"{len(ids) / words:.2f} total_ids={len(ids)} "
          f"distinct={len(set(ids))}")
    rt = tok.decode(ids).split()
    assert rt == text.split(), "decode(encode(text)) round-trip failed"
    tok.save(VOCAB_PATH)
    print(f"saved {VOCAB_PATH}")
