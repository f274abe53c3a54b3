"""Single-query debug surface: an in-memory gazetteer index + ``match_one``.

Reference: the matcher's single-query path + explanation API
(cmd/matcher-v2/main.go:522-578 ``runSingleQuery``,
internal/match/engine.go:283-337 ``Match``/``GetExplanation``,
internal/match/scorer.go:200-250 per-feature contribution breakdown).

The index is the actor-state analogue of the reference's in-process
candidate generator: built ONCE from a gazetteer Dataset (band-key ->
ids buckets + id -> payload), then ``match_one(text)`` runs the full
candidate → score → decide path for a single query with a ranked
candidate list and a per-feature explanation.  Use it inside an
actor (``__init__`` builds, ``__call__`` queries) for a serving pool, or
driver-side for debugging — it never touches Ray itself.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import MatchTiers, BlockingConfig, FeatureWeights
from ..functions import features as F
from ..functions import normalize as N
from ..stages.blocking import BandKeyEmitter
from ..stages import scoring as SC


def _canon_one(text: str) -> str:
    import pyarrow as pa

    arr, _ = N.canonical_batch(pa.array([text or ""], pa.string()))
    return arr.to_pylist()[0]


@dataclass
class RankedCandidate:
    cand_id: str
    text: str
    score: float
    features: dict = field(default_factory=dict)


class GazetteerIndex:
    """In-memory LSH-bucket index over a gazetteer.

    ``rows`` is an iterable of (id, text); typically fed from
    ``gazetteer_ds.iter_rows()`` at build time (the gazetteer is the
    SMALL side; at scale shard the index across an actor pool by key
    range and fan the query out).
    """

    def __init__(
        self,
        rows,
        blocking: BlockingConfig | None = None,
        tiers: MatchTiers | None = None,
        weights: FeatureWeights | None = None,
    ):
        self.blocking = blocking or BlockingConfig()
        self.tiers = tiers or MatchTiers()
        self.weights = weights or FeatureWeights()
        self._emitter = BandKeyEmitter(self.blocking)
        self.payload: dict[str, tuple[str, str]] = {}
        self.buckets: dict[int, list[str]] = {}
        texts, ids = [], []
        for gid, text in rows:
            gid = str(gid)
            canon = _canon_one(text)
            self.payload[gid] = (text or "", canon)
            texts.append(canon)
            ids.append(gid)
        if ids:
            keys = self._emitter.key_matrix(texts)
            for i, gid in enumerate(ids):
                for k in keys[i]:
                    self.buckets.setdefault(int(k), []).append(gid)
        # idf over the gazetteer texts (the single-query analogue of
        # stages/correct.fit_token_df)
        from collections import Counter

        df: Counter[str] = Counter()
        for t in texts:
            if t:
                df.update(set(t.split(" ")))
        self.n_docs = max(1, len(texts))
        self.idf = SC.fit_idf(dict(df), self.n_docs)
        self._scorer = SC.PairScorer(idf=self.idf, n_docs=self.n_docs)

    def candidates_for(self, text: str) -> list[str]:
        """LSH candidate lookup (J4/J6 analogue of the trigram-GIN probe)."""
        keys = self._emitter.key_matrix([_canon_one(text)])[0]
        seen: set[str] = set()
        out: list[str] = []
        for k in keys:
            for gid in self.buckets.get(int(k), ()):
                if gid not in seen:
                    seen.add(gid)
                    out.append(gid)
        return out

    def match_one(self, text: str, top_k: int = 10) -> dict:
        """query text -> {decision, accepted_id, candidates, explanation}.

        Scores every blocked candidate with the production blend, ranks,
        applies the D2 tier decision (incl. the 0.88 medium tier), and
        attaches the reference-style per-feature contribution breakdown
        for the top candidate (scorer.go:200-250)."""
        import pyarrow as pa

        cand_ids = self.candidates_for(text)
        canon = _canon_one(text)
        if not cand_ids:
            return {
                "query": text,
                "decision": "reject",
                "accepted_id": "",
                "candidate_count": 0,
                "candidates": [],
                "explanation": {"reason": "no blocked candidates"},
            }
        batch = pa.table(
            {
                "url_a": pa.array(["q"] * len(cand_ids)),
                "url_b": pa.array(cand_ids),
                "text_a": pa.array([text or ""] * len(cand_ids)),
                "text_b": pa.array([self.payload[g][0] for g in cand_ids]),
                "canonical_a": pa.array([canon] * len(cand_ids)),
                "canonical_b": pa.array([self.payload[g][1] for g in cand_ids]),
            }
        )
        scored = self._scorer(batch)
        order = np.argsort(
            np.stack(
                [-scored["score"].to_numpy(), np.arange(len(cand_ids))], axis=1
            )[:, 0],
            kind="stable",
        )
        ranked: list[RankedCandidate] = []
        for i in order[:top_k]:
            i = int(i)
            ranked.append(
                RankedCandidate(
                    cand_id=cand_ids[i],
                    text=self.payload[cand_ids[i]][0],
                    score=float(scored["score"][i].as_py()),
                    features={
                        "jaro_winkler": float(scored["jaro_winkler"][i].as_py()),
                        "token_set_ratio": float(scored["token_set_ratio"][i].as_py()),
                        "tfidf_cosine": float(scored["tfidf_cosine"][i].as_py()),
                        "house_veto": bool(scored["house_veto"][i].as_py()),
                        "has_same_house_num": bool(scored["has_same_house_num"][i].as_py()),
                        "locality_overlap": float(scored["locality_overlap"][i].as_py()),
                    },
                )
            )

        decision, accepted = "reject", ""
        if ranked:
            sc = [
                F.ScoredCandidate(
                    cand_id=r.cand_id,
                    score=r.score,
                    has_same_house_num=r.features["has_same_house_num"],
                    locality_overlap_ratio=r.features["locality_overlap"],
                )
                for r in ranked
            ]
            decision, accepted = F.make_decision(sc, self.tiers)
            if ranked[0].features["house_veto"] and decision == "auto_accept":
                # conservative validator (P6): never auto-accept a vetoed pair
                decision, accepted = "review", ""

        explanation: dict = {
            "query": text,
            "decision": decision,
            "accepted_id": accepted,
            "candidate_count": len(cand_ids),
        }
        if ranked:
            top = ranked[0]
            w = self._scorer.prod
            explanation["top_candidate"] = {
                "cand_id": top.cand_id,
                "jaro_winkler_contribution": top.features["jaro_winkler"] * w.jaro_winkler,
                "token_set_contribution": top.features["token_set_ratio"] * w.token_set,
                "tfidf_contribution": top.features["tfidf_cosine"] * w.tfidf_cosine,
                "house_veto": top.features["house_veto"],
                "final_score": top.score,
            }
        return {
            "query": text,
            "decision": decision,
            "accepted_id": accepted,
            "candidate_count": len(cand_ids),
            "candidates": ranked,
            "explanation": explanation,
        }
