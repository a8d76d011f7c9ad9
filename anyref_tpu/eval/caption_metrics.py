"""Caption metrics: BLEU-n and CIDEr-D, native implementations.

Replace pycocoevalcap (reference eval_refer_inv.py:204-211; not installed
here). Standard definitions: BLEU with corpus-level brevity penalty and
clipped n-gram precision; CIDEr-D with tf-idf 1-4gram cosine similarity,
length gaussian penalty (sigma 6) and the *10 scale.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import List, Sequence


def _tokens(s: str) -> List[str]:
    return s.lower().strip().split()


def _ngrams(toks: Sequence[str], n: int) -> Counter:
    return Counter(tuple(toks[i:i + n]) for i in range(len(toks) - n + 1))


def bleu_n(hypotheses: List[str], references: List[List[str]],
           n: int = 4) -> float:
    """Corpus BLEU-n with uniform weights and standard brevity penalty."""
    log_precisions = []
    hyp_len = ref_len = 0
    clipped = [0] * n
    totals = [0] * n
    for hyp, refs in zip(hypotheses, references):
        h = _tokens(hyp)
        rs = [_tokens(r) for r in refs]
        hyp_len += len(h)
        ref_len += min((abs(len(r) - len(h)), len(r)) for r in rs)[1]
        for k in range(1, n + 1):
            hc = _ngrams(h, k)
            if not hc:
                continue
            max_ref = Counter()
            for r in rs:
                rc = _ngrams(r, k)
                for g, c in rc.items():
                    max_ref[g] = max(max_ref[g], c)
            clipped[k - 1] += sum(min(c, max_ref.get(g, 0))
                                  for g, c in hc.items())
            totals[k - 1] += sum(hc.values())
    for k in range(n):
        if totals[k] == 0 or clipped[k] == 0:
            return 0.0
        log_precisions.append(math.log(clipped[k] / totals[k]))
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
    return float(bp * math.exp(sum(log_precisions) / n))


def cider_d(hypotheses: List[str], references: List[List[str]],
            n: int = 4, sigma: float = 6.0) -> float:
    """CIDEr-D over the eval corpus (document frequency from the reference
    sets)."""
    # document frequencies per n
    dfs = [Counter() for _ in range(n)]
    num_docs = len(references)
    ref_counts = []
    for refs in references:
        per_ref = []
        seen = [set() for _ in range(n)]
        for r in refs:
            toks = _tokens(r)
            cs = [_ngrams(toks, k + 1) for k in range(n)]
            per_ref.append((cs, len(toks)))
            for k in range(n):
                seen[k].update(cs[k])
        for k in range(n):
            for g in seen[k]:
                dfs[k][g] += 1
        ref_counts.append(per_ref)

    def tfidf_vec(counts: Counter, k: int):
        vec = {}
        norm = 0.0
        length = max(sum(counts.values()), 1)
        for g, c in counts.items():
            df = math.log(max(dfs[k][g], 1.0))
            idf = math.log(max(num_docs, 1)) - df
            w = (c / length) * idf
            vec[g] = w
            norm += w * w
        return vec, math.sqrt(norm)

    scores = []
    for hyp, per_ref in zip(hypotheses, ref_counts):
        htoks = _tokens(hyp)
        hlen = len(htoks)
        score = 0.0
        for k in range(n):
            hvec, hnorm = tfidf_vec(_ngrams(htoks, k + 1), k)
            s_k = 0.0
            for (rcs, rlen) in per_ref:
                rvec, rnorm = tfidf_vec(rcs[k], k)
                num = sum(min(hvec[g], rvec.get(g, 0.0)) * rvec.get(g, 0.0)
                          for g in hvec)
                denom = hnorm * rnorm
                sim = num / denom if denom > 0 else 0.0
                sim *= math.exp(-((hlen - rlen) ** 2) / (2 * sigma ** 2))
                s_k += sim
            score += s_k / max(len(per_ref), 1)
        scores.append(score / n * 10.0)
    return float(sum(scores) / max(len(scores), 1))
