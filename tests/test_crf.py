"""CRF correctness: Viterbi vs brute force, gradients vs finite differences,
determinism, OOV inertness, serialization (SURVEY.md §5 rebuild plan)."""

import itertools

import numpy as np
import pytest

from nerfray.core import crf, schema


def tiny_model(seed=0, nobs=6, L=3):
    rng = np.random.default_rng(seed)
    ov = {f"o{i}": i for i in range(nobs)}
    lv = {f"l{i}": i for i in range(L)}
    m = crf.Crf(ov, lv,
                rng.normal(size=(nobs, L)), rng.normal(size=(L, L)),
                rng.normal(size=L),
                np.ones((nobs, L), bool), np.ones((L, L), bool),
                np.ones(L, bool))
    return m


def seq_score(m, obs_ids, ys):
    E = m.emissions(obs_ids)
    s = m.w_start[ys[0]] + E[0, ys[0]]
    for t in range(1, len(ys)):
        s += m.w_trans[ys[t - 1], ys[t]] + E[t, ys[t]]
    return s


@pytest.mark.parametrize("seed", range(5))
def test_viterbi_matches_bruteforce(seed):
    m = tiny_model(seed)
    rng = np.random.default_rng(seed + 100)
    T = int(rng.integers(1, 5))
    sent = [{f"o{int(i)}" for i in rng.choice(6, size=2, replace=False)}
            for _ in range(T)]
    obs_ids = m.encode_obs(sent)
    best = max(itertools.product(range(3), repeat=T),
               key=lambda ys: seq_score(m, obs_ids, list(ys)))
    got = [m.label_vocab[s] for s in m.viterbi(sent)]
    assert seq_score(m, obs_ids, list(got)) == pytest.approx(
        seq_score(m, obs_ids, list(best)))


@pytest.mark.parametrize("seed", range(3))
def test_partition_function_matches_bruteforce(seed):
    m = tiny_model(seed)
    sent = [{"o0", "o3"}, {"o1"}, {"o2", "o5"}]
    obs_ids = m.encode_obs(sent)
    E = m.emissions(obs_ids)
    logZ = crf._logsumexp(m._alpha(E)[-1])
    brute = crf._logsumexp(np.array(
        [seq_score(m, obs_ids, list(ys))
         for ys in itertools.product(range(3), repeat=3)]))
    assert logZ == pytest.approx(brute, abs=1e-9)


def test_gradient_matches_finite_difference():
    """d loglik / d w == empirical - expected (the training gradient)."""
    m = tiny_model(7)
    sent = [{"o0", "o1"}, {"o2"}, {"o4", "o5"}]
    y = np.array([0, 2, 1])
    obs_ids = m.encode_obs(sent)
    eps = 1e-6

    def analytic_obs_grad(o, l):
        E = m.emissions(obs_ids)
        alpha, beta = m._alpha(E), m._beta(E)
        logZ = crf._logsumexp(alpha[-1])
        g = 0.0
        for t, ids in enumerate(obs_ids):
            if o in ids:
                marg = np.exp(alpha[t, l] + beta[t, l] - logZ)
                g += (1.0 if y[t] == l else 0.0) - marg
        return g

    for (o, l) in [(0, 0), (2, 2), (4, 1), (5, 0)]:
        g = analytic_obs_grad(o, l)
        m.w_obs[o, l] += eps
        up = m.loglik(obs_ids, y)
        m.w_obs[o, l] -= 2 * eps
        dn = m.loglik(obs_ids, y)
        m.w_obs[o, l] += eps
        assert g == pytest.approx((up - dn) / (2 * eps), abs=1e-4)


def _toy_data():
    sents, labels = [], []
    conf = schema.SchemaConf(orth=[0])
    data = [("john runs", ["B:per", "O"]),
            ("mary runs fast", ["B:per", "O", "O"]),
            ("john likes mary", ["B:per", "O", "B:per"]),
            ("runs fast", ["O", "O"])] * 10
    for text, ys in data:
        sents.append(schema.schematize(conf, text.split()))
        labels.append(ys)
    return sents, labels, conf


def test_train_learns_and_is_deterministic():
    sents, labels, conf = _toy_data()
    m1 = crf.train(sents, labels, crf.SgdArgs(iter_num=4))
    m2 = crf.train(sents, labels, crf.SgdArgs(iter_num=4))
    np.testing.assert_array_equal(m1.w_obs, m2.w_obs)
    got = m1.viterbi(schema.schematize(conf, ["mary", "runs", "john"]))
    assert got == ["B:per", "O", "B:per"]


def test_oov_observations_inert():
    sents, labels, conf = _toy_data()
    m = crf.train(sents, labels, crf.SgdArgs(iter_num=4))
    base = m.viterbi([{"0.0@0=john"}, {"0.0@0=runs"}])
    wit = m.viterbi([{"0.0@0=john", "NEVER_SEEN=zz"}, {"0.0@0=runs"}])
    assert base == wit == ["B:per", "O"]


def test_present_feats_mask():
    """(ob, label) pairs absent from gold keep weight exactly 0."""
    sents, labels, _ = _toy_data()
    m = crf.train(sents, labels, crf.SgdArgs(iter_num=4))
    assert np.all(m.w_obs[~m.m_obs] == 0.0)
    assert np.all(m.w_trans[~m.m_trans] == 0.0)
    assert np.all(m.w_start[~m.m_start] == 0.0)
    # but the mask itself is nontrivial
    assert not m.m_obs.all()


def test_serialization_roundtrip():
    sents, labels, conf = _toy_data()
    m = crf.train(sents, labels, crf.SgdArgs(iter_num=2))
    m2 = crf.Crf.from_bytes(m.to_bytes())
    np.testing.assert_array_equal(m.w_obs, m2.w_obs)
    np.testing.assert_array_equal(m.w_trans, m2.w_trans)
    assert m.label_vocab == m2.label_vocab
    s = schema.schematize(conf, ["john", "likes", "mary"])
    assert m.viterbi(s) == m2.viterbi(s)


def test_empty_sentence():
    sents, labels, _ = _toy_data()
    m = crf.train(sents, labels, crf.SgdArgs(iter_num=1))
    assert m.viterbi([]) == []
