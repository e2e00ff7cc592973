"""PersonalizationEngine: profile store semantics
(PersonalizationEngine.ts:49-293) + opt-in rank-time boost."""

import json

import pytest

from search_engine_ray.state import PersonalizationEngine


class TestProfileStore:
    def test_add_event_counts_and_boost(self, tmp_path):
        pe = PersonalizationEngine(str(tmp_path / "p.json"))
        pe.add_event("u1", 42)
        pe.add_event("u1", 42)
        pe.add_event("u1", 7, "purchase")
        assert pe.get_boost("u1", 42) == 2
        assert pe.get_boost("u1", 7) == 1
        assert pe.get_boost("u1", 999) == 0  # no interaction → 0 (ts:158)
        assert pe.get_boost("nobody", 42) == 0

    def test_invalid_inputs(self, tmp_path):
        pe = PersonalizationEngine(str(tmp_path / "p.json"))
        with pytest.raises(ValueError):
            pe.add_event("", 1)
        with pytest.raises(ValueError):
            pe.add_event("u", 1, "teleport")
        with pytest.raises(ValueError):
            PersonalizationEngine("")

    def test_save_load_roundtrip(self, tmp_path):
        path = str(tmp_path / "p.json")
        pe = PersonalizationEngine(path)
        pe.add_event("u1", 1)
        pe.set_user_preferences("u1", {"theme": "dark"})
        pe.add_user_tags("u1", ["a", "b", "a"])

        pe2 = PersonalizationEngine(path)  # load() in constructor (ts:60)
        assert pe2.get_boost("u1", 1) == 1
        prof = pe2.get_user_profile("u1")
        assert prof["preferences"] == {"theme": "dark"}
        assert prof["tags"] == ["a", "b"]  # unique, order kept (ts:229-233)

    def test_corrupt_file_continues_empty(self, tmp_path):
        path = tmp_path / "p.json"
        path.write_text("{not json")
        pe = PersonalizationEngine(str(path))  # ts:85-88: log + empty map
        assert pe.get_user_ids() == []

    def test_remove_clear_stats(self, tmp_path):
        pe = PersonalizationEngine(str(tmp_path / "p.json"))
        pe.add_event("u1", 1)
        pe.add_event("u2", 2)
        pe.add_event("u2", 2)
        s = pe.stats()
        assert s["totalUsers"] == 2 and s["totalEvents"] == 3
        assert pe.remove_user("u1") is True
        assert pe.remove_user("u1") is False
        pe.clear()
        assert pe.stats()["totalUsers"] == 0
        # persisted state reflects the clear
        assert json.loads((tmp_path / "p.json").read_text()) == {}


@pytest.fixture(scope="module")
def boost_index(tmp_path_factory, ray_session):
    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.sources.webpages import generate_pages

    root = tmp_path_factory.mktemp("pers")
    corpus = str(root / "corpus")
    generate_pages(corpus, n_rows=400, seed=11, n_files=2)
    idx = str(root / "idx")
    build_index(idx, corpus, BuildConfig(n_partitions=2))
    return idx


class TestRankTimeBoost:
    def test_boost_reorders_and_adds_counts(self, boost_index, tmp_path):
        from search_engine_ray.query import IndexSearcher

        pe = PersonalizationEngine(str(tmp_path / "p.json"))
        base = IndexSearcher(boost_index).search("the data", size=10,
                                                operator="or")
        assert len(base) >= 5
        # boost the currently-last hit above everything
        target = int(base["doc_id"].iloc[-1])
        gap = float(base["score"].iloc[0] - base["score"].iloc[-1])
        nclicks = int(gap) + 2
        for _ in range(nclicks):
            pe.add_event("alice", target)

        s = IndexSearcher(boost_index, personalization=pe)
        boosted = s.search("the data", size=10, operator="or",
                           user_id="alice")
        assert int(boosted["doc_id"].iloc[0]) == target
        tgt_base = float(
            base.loc[base["doc_id"] == target, "score"].iloc[0]
        )
        tgt_boost = float(
            boosted.loc[boosted["doc_id"] == target, "score"].iloc[0]
        )
        assert tgt_boost == pytest.approx(tgt_base + nclicks)
        # other users / no user: unchanged ranking
        other = s.search("the data", size=10, operator="or", user_id="bob")
        assert other["doc_id"].tolist() == base["doc_id"].tolist()
        plain = s.search("the data", size=10, operator="or")
        assert plain["doc_id"].tolist() == base["doc_id"].tolist()

    def test_boost_resurfaces_doc_outside_topk(self, boost_index, tmp_path):
        """A boosted doc that would not make the unboosted top-k must
        surface (boost applied before partition top-k selection)."""
        from search_engine_ray.query import IndexSearcher

        s0 = IndexSearcher(boost_index)
        wide = s0.search("the data", size=200, operator="or")
        assert len(wide) > 30
        target = int(wide["doc_id"].iloc[-1])  # deep in the ranking
        spread = float(wide["score"].iloc[0] - wide["score"].iloc[-1])

        pe = PersonalizationEngine(str(tmp_path / "p2.json"))
        for _ in range(int(spread) + 2):
            pe.add_event("carol", target)
        s = IndexSearcher(boost_index, personalization=pe)
        top3 = s.search("the data", size=3, operator="or", user_id="carol")
        assert int(top3["doc_id"].iloc[0]) == target
