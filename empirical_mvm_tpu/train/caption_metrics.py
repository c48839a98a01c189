"""Caption evaluation metrics: BLEU-4 and CIDEr-D.

The reference delegates to a vendored ``evalcap`` COCO toolkit that is
MISSING from its tree (ref: main_caption.py:13 imports
``evalcap.utils_caption_evaluate`` which does not exist — SURVEY.md §2.1
marks captioning "best-effort parity"). Here the two headline metrics are
implemented directly from their public definitions (Papineni et al. 2002;
Vedantam et al. 2015), operating on whitespace-tokenized strings like the
COCO toolkit after PTB tokenization.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Mapping, Sequence


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def bleu4(hypotheses: Mapping[str, str],
          references: Mapping[str, Sequence[str]]) -> float:
    """Corpus BLEU-4 with uniform weights and brevity penalty."""
    p_num = [0] * 4
    p_den = [0] * 4
    hyp_len = 0
    ref_len = 0
    for key, hyp in hypotheses.items():
        h = hyp.split()
        refs = [r.split() for r in references[key]]
        hyp_len += len(h)
        ref_len += min((abs(len(r) - len(h)), len(r)) for r in refs)[1]
        for n in range(1, 5):
            hng = _ngrams(h, n)
            best = Counter()
            for r in refs:
                rng = _ngrams(r, n)
                for g, c in rng.items():
                    best[g] = max(best[g], c)
            clipped = sum(min(c, best[g]) for g, c in hng.items())
            p_num[n - 1] += clipped
            p_den[n - 1] += max(sum(hng.values()), 0)
    if min(p_num) == 0:
        return 0.0
    log_p = sum(math.log(p_num[i] / p_den[i]) for i in range(4)) / 4
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
    return bp * math.exp(log_p)


def cider_d(hypotheses: Mapping[str, str],
            references: Mapping[str, Sequence[str]],
            n_max: int = 4, sigma: float = 6.0) -> float:
    """CIDEr-D: tf-idf weighted n-gram cosine similarity with length
    penalty, averaged over n in 1..4 and references."""
    # document frequencies over reference sets
    doc_freq: list[Counter] = [Counter() for _ in range(n_max)]
    for refs in references.values():
        for n in range(n_max):
            seen = set()
            for r in refs:
                seen.update(_ngrams(r.split(), n + 1).keys())
            for g in seen:
                doc_freq[n][g] += 1
    n_docs = max(len(references), 1)

    def tfidf_vec(tokens, n):
        cnt = _ngrams(tokens, n + 1)
        total = max(sum(cnt.values()), 1)
        vec = {}
        norm = 0.0
        for g, c in cnt.items():
            df = math.log(max(doc_freq[n][g], 1))
            w = (c / total) * max(math.log(n_docs) - df, 0.0)
            vec[g] = w
            norm += w * w
        return vec, math.sqrt(norm), len(tokens)

    scores = []
    for key, hyp in hypotheses.items():
        h_toks = hyp.split()
        score_n = [0.0] * n_max
        for n in range(n_max):
            hv, hnorm, hlen = tfidf_vec(h_toks, n)
            for r in references[key]:
                r_toks = r.split()
                rv, rnorm, rlen = tfidf_vec(r_toks, n)
                num = sum(min(hv.get(g, 0.0), rv.get(g, 0.0)) * rv.get(g, 0.0)
                          for g in hv)
                denom = hnorm * rnorm
                sim = num / denom if denom > 0 else 0.0
                sim *= math.exp(-((hlen - rlen) ** 2) / (2 * sigma ** 2))
                score_n[n] += sim
            score_n[n] /= max(len(references[key]), 1)
        scores.append(10.0 * sum(score_n) / n_max)
    return sum(scores) / max(len(scores), 1)


def caption_scores(hypotheses: Mapping[str, str],
                   references: Mapping[str, Sequence[str]]) -> dict:
    return {"bleu4": bleu4(hypotheses, references) * 100,
            "cider": cider_d(hypotheses, references)}
