#!/usr/bin/env python3
"""Offline BPE merges trainer + independent reference encoder.

Learns a byte-pair-encoding merges table (Sennrich, Haddow & Birch
2016, "Neural Machine Translation of Rare Words with Subword Units" —
the greedy highest-frequency pair algorithm GPT-2's tokenizer also
uses) from the embedded public word-frequency corpus below, and writes
it to src/main/resources/graft/bpe_merges.tsv with a provenance
header (the PSL / html_entities vendoring play: deterministic,
regenerable offline, no network).

This environment has no egress, so the GPT-2 merges file itself cannot
be fetched; the point of the engine's `bpe_encode_count` expression is
that it applies ANY merges table correctly — swap this learned table
for the real gpt2 merges.txt on a networked machine and the expression
is the production fertility metric.

Run:  python3 tools/train_bpe.py          # retrain + restamp
      python3 tools/train_bpe.py --cases  # print the q126 oracle rows

The --cases output is the INDEPENDENT implementation of merge
application used for the q126 oracle literals (the q104 rule: oracle
values computed by a non-engine path over the shared case table).
"""
import hashlib
import sys
from collections import Counter

# ---------------------------------------------------------------------
# Embedded training corpus: ~130 high-frequency English words (public
# knowledge: any general word-frequency list orders roughly this way)
# with zipf-ish weights 1000/rank, plus a handful of domain words so
# technical text fragments merge realistically. Deterministic.
# ---------------------------------------------------------------------
WORDS = (
    "the of and to in a is that for it as was with be by on not he i this "
    "are or his from at which but have an had they you were there one all "
    "we can her has been would their what will when who more if no out so "
    "said up its about into than them only other time new some could these "
    "two may then do first any my now such like our over man even most "
    "made after also did many before must through years where much your "
    "way well down should because each just those people how too little "
    "state good very make world still own see men work long get here "
    "between both life being under never day same another know while last "
    "might us great old year off come since against go came right used "
    "take three states himself few house use during without again place "
    "around however home small found thought went say part once general "
    "high upon school every does got united left number course war until "
    "always away something fact though water less public put think almost "
    "hand enough far took head yet government system better set told "
    "nothing night end why called didnt eyes find going look asked later "
    "knew point next city business data training model token text "
    "pipeline quality document language word count spark query table "
).split()

EXTRA = {"data": 400, "text": 380, "token": 350, "training": 330,
         "model": 320, "pipeline": 300, "document": 280, "quality": 260,
         "language": 240, "spark": 220, "query": 200, "table": 180,
         "word": 160, "count": 150}

N_MERGES = 400
OUT = "src/main/resources/graft/bpe_merges.tsv"
END = "</w>"


def word_symbols(word):
    """Sennrich representation: chars, the last one carrying </w>."""
    if not word:
        return []
    chars = list(word)
    chars[-1] = chars[-1] + END
    return chars


def learn(corpus, n_merges):
    vocab = {}
    for w, f in corpus.items():
        vocab[tuple(word_symbols(w))] = vocab.get(tuple(word_symbols(w)), 0) + f
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # deterministic: highest frequency, ties to the lexicographically
        # smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def encode(word, ranks):
    """Apply merges: repeatedly merge the LOWEST-rank adjacent pair
    (all its occurrences, left to right) until none remains. This is
    the reference implementation the Scala expression must match."""
    syms = word_symbols(word)
    while len(syms) > 1:
        best = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best[0]):
                best = (r, (syms[i], syms[i + 1]))
        if best is None:
            break
        a, b = best[1]
        out = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# q52's exact pretokenizer (the Java/RE2-identical dialect)
import re
PRETOKEN = re.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f]+")


def count_tokens(text, ranks):
    return sum(len(encode(tok, ranks)) for tok in PRETOKEN.findall(text))


# the q126 shared case table (adversarial: rank-priority order, repeated
# chars, case sensitivity, digit/punct runs, unseen chars, empties)
CASES = [
    ("c01_common", "the of and to in"),
    ("c02_sentence", "the quick brown fox jumps over the lazy dog"),
    ("c03_tech", "data pipeline token count for training text"),
    ("c04_repeat", "aaaaaa thththth"),
    ("c05_case", "THE The the"),
    ("c06_punct", "dont stop: a test, with punctuation!"),
    ("c07_digits", "version 42 build 20260815"),
    ("c08_unseen", "zqxj zzzzqqqq"),
    ("c09_singles", "a b c d e"),
    ("c10_long", "internationalization of documentation"),
    ("c11_mixed", "spark query over table 7 rows; done."),
    ("c12_unicode", "café 日本"),
]


def main():
    corpus = Counter()
    for rank, w in enumerate(WORDS, start=1):
        corpus[w] += max(1000 // rank, 5)
    for w, f in EXTRA.items():
        corpus[w] += f
    merges = learn(dict(corpus), N_MERGES)
    ranks = {p: i for i, p in enumerate(merges)}

    if "--cases" in sys.argv:
        for cid, text in CASES:
            print(f"('{cid}', CAST({count_tokens(text, ranks)} AS BIGINT)),")
        return

    payload = "".join(f"{a}\t{b}\n" for a, b in merges)
    sha = hashlib.sha256(payload.encode()).hexdigest()
    header = (
        "# Learned BPE merges (Sennrich et al. 2016 greedy pair algorithm,\n"
        "# the GPT-2 tokenizer's merge rule). Source: trained OFFLINE by\n"
        "# tools/train_bpe.py from the script's embedded public\n"
        "# word-frequency corpus (deterministic; regenerate with\n"
        "# python3 tools/train_bpe.py; no network needed). Swap for the\n"
        "# real gpt2 merges.txt on a networked machine - the loader and\n"
        "# the expression are table-agnostic.\n"
        f"# Snapshot: 2026-08-15  merges={len(merges)}\n"
        f"# payload-sha256: {sha}\n"
        "# Format: left<TAB>right (priority = line order, highest first)\n"
    )
    with open(OUT, "w") as f:
        f.write(header + payload)
    print(f"wrote {OUT}: {len(merges)} merges, payload sha256 {sha}")


if __name__ == "__main__":
    main()
