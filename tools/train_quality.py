#!/usr/bin/env python3
"""Offline hashed-linear quality-classifier trainer.

Trains a fastText-style linear document-quality classifier (Joulin et
al. 2017, "Bag of Tricks for Efficient Text Classification": mean-
pooled hashed n-gram features into a linear layer) over the engine's
EXACT feature hash -- md5-derived unigram+bigram buckets, the
`hashed_grams` expression (`HashingHelper.dsirBuckets`) -- and writes
the learned weights to src/main/resources/graft/quality_weights.tsv
with a provenance header (the bpe_merges.tsv vendoring play:
deterministic, regenerable offline, no network).

This environment has no egress, so no public labeled corpus (e.g. the
fastText CCNet quality model) can be fetched; the training set is the
deterministic synthetic corpus embedded below -- natural-English-like
prose as the positive class vs the four classic web-junk shapes (spam
keyword stuffing, gibberish strings, single-token repetition, nav/
boilerplate chrome) as the negative. The point of the engine's scorer
is that it applies ANY (bias, weights) table with the exact fastText
arithmetic -- swap this table for one trained on labeled production
data and the scorer is unchanged.

Model: z = bias + sum_g w[bucket(g)] / N over the N gram occurrences
of a document, p(quality) = sigmoid(z). Full-batch gradient descent
on binary cross-entropy with L2; everything seeded -> byte-identical
regeneration.
"""
import hashlib
import math
import random

BUCKETS = 1024
SEED = 13
MASK62 = (1 << 62) - 1

OUT = "src/main/resources/graft/quality_weights.tsv"


def md5lo62(s: str) -> int:
    """HashingHelper.md5lo62: md5 digest bytes 8..15 little-endian,
    masked to 62 bits (= DuckDB md5_number_lower % 2^62)."""
    d = hashlib.md5(s.encode("utf-8")).digest()
    return int.from_bytes(d[8:16], "little") & MASK62


def tokenize(s: str):
    """HashingHelper.tokenize: maximal [a-zA-Z0-9] runs, lowercased."""
    out, cur = [], []
    for c in s:
        if ("a" <= c <= "z") or ("0" <= c <= "9"):
            cur.append(c)
        elif "A" <= c <= "Z":
            cur.append(chr(ord(c) + 32))
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


def buckets_of(text: str):
    """HashingHelper.dsirBuckets: per-occurrence unigram then bigram
    buckets, in order."""
    toks = tokenize(text)
    out = [md5lo62(t) % BUCKETS for t in toks]
    out += [md5lo62(toks[i] + " " + toks[i + 1]) % BUCKETS
            for i in range(len(toks) - 1)]
    return out


# --- deterministic synthetic corpus -------------------------------------
FUNCTION_WORDS = ("the a an of to and in that is was for with as on at by "
                  "from it this but are be or had not have has were which "
                  "you they we he she his her their its when where how what "
                  "who will would can could about into over after before "
                  "between through during more most some any each other such "
                  "no nor only own same so than too very just there here").split()

CONTENT_WORDS = ("time year people way day man thing woman life child world "
                 "school state family student group country problem hand part "
                 "place case week company system program question work night "
                 "point home water room mother area money story fact month lot "
                 "right study book eye job word business issue side kind head "
                 "house service friend father power hour game line end member "
                 "law car city community name president team minute idea body "
                 "information back parent face others level office door health "
                 "person art war history party result change morning reason "
                 "research girl guy moment air teacher force education foot boy "
                 "age policy music market sense nation plan college interest "
                 "death experience effect use class control care field "
                 "development role effort rate heart drug show leader light "
                 "voice wife mind price report decision value").split()

SPAM_WORDS = ("buy cheap now click here discount offer free win winner prize "
              "deal sale limited exclusive bonus casino viagra pills earn cash "
              "guaranteed instant approval loan credit unsubscribe").split()

NAV_WORDS = ("home about contact login register signup privacy cookie cookies "
             "terms conditions sitemap search menu next previous page share "
             "tweet follow subscribe newsletter copyright reserved rights "
             "skip navigation footer header").split()


def good_doc(rnd):
    n = rnd.randint(30, 120)
    words = []
    for _ in range(n):
        if rnd.random() < 0.45:
            words.append(rnd.choice(FUNCTION_WORDS))
        else:
            words.append(rnd.choice(CONTENT_WORDS))
    return " ".join(words)


def bad_doc(rnd):
    kind = rnd.randrange(4)
    n = rnd.randint(30, 120)
    if kind == 0:      # spam keyword stuffing
        return " ".join(rnd.choice(SPAM_WORDS) for _ in range(n))
    if kind == 1:      # gibberish strings
        cons = "bcdfghjklmnpqrstvwxz"
        return " ".join(
            "".join(rnd.choice(cons) for _ in range(rnd.randint(5, 12)))
            for _ in range(n))
    if kind == 2:      # single-token repetition
        w = rnd.choice(CONTENT_WORDS)
        return " ".join(w for _ in range(n))
    # nav / boilerplate chrome
    return " ".join(rnd.choice(NAV_WORDS) for _ in range(n))


def corpus(n_docs, seed):
    rnd = random.Random(seed)
    docs = []
    for _ in range(n_docs):
        if rnd.random() < 0.5:
            docs.append((good_doc(rnd), 1.0))
        else:
            docs.append((bad_doc(rnd), 0.0))
    return docs


def features(text):
    """Mean-pooled bucket counts: x[bk] = count(bk) / N."""
    bks = buckets_of(text)
    x = {}
    if not bks:
        return x
    inv = 1.0 / len(bks)
    for bk in bks:
        x[bk] = x.get(bk, 0.0) + inv
    return x


def train(docs, iters=2000, lr=10.0, l2=1e-5):
    w = [0.0] * BUCKETS
    b = 0.0
    feats = [(features(t), y) for t, y in docs]
    n = len(feats)
    for _ in range(iters):
        gw = [0.0] * BUCKETS
        gb = 0.0
        for x, y in feats:
            z = b + sum(w[bk] * v for bk, v in x.items())
            p = 1.0 / (1.0 + math.exp(-z))
            d = p - y
            gb += d
            for bk, v in x.items():
                gw[bk] += d * v
        b -= lr * gb / n
        for i in range(BUCKETS):
            w[i] -= lr * (gw[i] / n + l2 * w[i])
    return b, w


def accuracy(docs, b, w):
    ok = 0
    for t, y in docs:
        x = features(t)
        z = b + sum(w[bk] * v for bk, v in x.items())
        ok += 1 if ((z >= 0.0) == (y >= 0.5)) else 0
    return ok / len(docs)


def main():
    train_docs = corpus(2000, SEED)
    test_docs = corpus(500, SEED + 1)
    b, w = train(train_docs)
    acc_tr = accuracy(train_docs, b, w)
    acc_te = accuracy(test_docs, b, w)
    with open(OUT, "w") as f:
        f.write("# Hashed-linear quality-classifier weights (fastText-style\n")
        f.write("# mean-pooled hashed unigram+bigram model, Joulin et al.\n")
        f.write("# 2017). Trained OFFLINE by tools/train_quality.py on the\n")
        f.write("# script's embedded deterministic synthetic corpus (seed\n")
        f.write(f"# {SEED}, 2000 docs; no network needed -- regenerate with\n")
        f.write("# python3 tools/train_quality.py). Feature hash = the\n")
        f.write("# engine's hashed_grams (md5lo62 mod buckets). Swap for a\n")
        f.write("# table trained on labeled production data; the scorer\n")
        f.write("# (Quality.hashedLinearScore) applies any such table.\n")
        f.write(f"# train-accuracy: {acc_tr:.4f}  heldout-accuracy: {acc_te:.4f}\n")
        f.write(f"buckets\t{BUCKETS}\n")
        f.write(f"bias\t{b!r}\n")
        for i, wi in enumerate(w):
            f.write(f"{i}\t{wi!r}\n")
    print(f"wrote {OUT}: bias={b:.4f} train_acc={acc_tr:.4f} "
          f"heldout_acc={acc_te:.4f} nonzero={sum(1 for x in w if x != 0.0)}")


if __name__ == "__main__":
    main()
