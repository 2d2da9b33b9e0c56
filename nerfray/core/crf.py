"""First-order linear-chain CRF: train (SGD), score, Viterbi tag.

Reference: dep ``crf-chain1-0.2.3`` + ``sgd-0.2.3`` at the call sites
/root/reference/src/NLP/Nerf.hs:85-98 (SURVEY.md §8.2-8.3). Model features
are binary and of three kinds — start S(y0), transition T(y', y) and
observation O(ob, y) — restricted to those PRESENT in the training data
(``CRF.presentFeats``, Nerf.hs:90): absent (ob, label) pairs keep weight 0
forever, and observations unseen at training time are silently inert at tag
time (OOV parity, SURVEY.md §8.2).

Training maximizes conditional log-likelihood with L2 regularization
(variance ``reg_var``) by minibatch SGD with the reference's hyperparameter
defaults (iter_num=10, batch_size=30, reg_var=10.0, gain0=1.0, tau=5.0 —
/root/reference/app/Main.hs:119-123). Pinned update rule (the Hackage sgd
source is not in the sandbox):

    gain_t = gain0 * tau / (tau + done_iters)          # done = completed epochs
    w     += gain_t * (grad_loglik(batch) - (|batch|/N) * w / reg_var)

All potentials are log-domain float64; forward-backward uses logsumexp;
Viterbi breaks ties deterministically toward the lowest label id (np.argmax
takes the first maximum), and label/observation vocabularies are built in
sorted order so results are independent of input sharding and parallelism
(SURVEY.md §7.4.1).
"""

from __future__ import annotations

import io
import json
from dataclasses import dataclass

import numpy as np

NEG_INF = -1e30


@dataclass
class SgdArgs:
    """Reference defaults: app/Main.hs:119-123."""
    batch_size: int = 30
    reg_var: float = 10.0
    iter_num: int = 10
    gain0: float = 1.0
    tau: float = 5.0
    seed: int = 42


class Crf:
    """A trained model. ``obs_vocab``/``label_vocab`` intern strings to ids
    (the reference's monad-codec layer, SURVEY.md §2.3 ST4)."""

    def __init__(self, obs_vocab: dict[str, int], label_vocab: dict[str, int],
                 w_obs: np.ndarray, w_trans: np.ndarray, w_start: np.ndarray,
                 m_obs: np.ndarray, m_trans: np.ndarray, m_start: np.ndarray):
        self.obs_vocab = obs_vocab
        self.label_vocab = label_vocab
        self.labels = [None] * len(label_vocab)
        for s, i in label_vocab.items():
            self.labels[i] = s
        self.w_obs, self.w_trans, self.w_start = w_obs, w_trans, w_start
        self.m_obs, self.m_trans, self.m_start = m_obs, m_trans, m_start

    # ---------------- encoding ----------------

    def encode_obs(self, sent_obs: list[set[str]]) -> list[np.ndarray]:
        """Observation strings -> id arrays; unknown observations dropped
        (inert, matching reference OOV behavior)."""
        ov = self.obs_vocab
        return [np.array(sorted(ov[o] for o in obs if o in ov), dtype=np.int64)
                for obs in sent_obs]

    def emissions(self, obs_ids: list[np.ndarray]) -> np.ndarray:
        """Log emission scores, shape (T, L)."""
        L = len(self.labels)
        E = np.zeros((len(obs_ids), L))
        for t, ids in enumerate(obs_ids):
            if len(ids):
                E[t] = self.w_obs[ids].sum(axis=0)
        return E

    # ---------------- inference ----------------

    def viterbi(self, sent_obs: list[set[str]]) -> list[str]:
        """Max-probability label sequence (reference ``CRF.tag``,
        Nerf.hs:98). Deterministic tie-break: first (lowest-id) maximum."""
        T = len(sent_obs)
        if T == 0:
            return []
        E = self.emissions(self.encode_obs(sent_obs))
        L = len(self.labels)
        delta = self.w_start + E[0]
        back = np.zeros((T, L), dtype=np.int64)
        for t in range(1, T):
            scores = delta[:, None] + self.w_trans + E[t][None, :]
            back[t] = np.argmax(scores, axis=0)
            delta = scores[back[t], np.arange(L)]
        path = np.zeros(T, dtype=np.int64)
        path[-1] = int(np.argmax(delta))
        for t in range(T - 1, 0, -1):
            path[t - 1] = back[t, path[t]]
        return [self.labels[int(i)] for i in path]

    def loglik(self, obs_ids: list[np.ndarray], y: np.ndarray) -> float:
        """Conditional log-likelihood of one sentence (for tests)."""
        E = self.emissions(obs_ids)
        T = len(obs_ids)
        score = self.w_start[y[0]] + E[0, y[0]]
        for t in range(1, T):
            score += self.w_trans[y[t - 1], y[t]] + E[t, y[t]]
        logZ = _logsumexp(self._alpha(E)[-1])
        return float(score - logZ)

    def _alpha(self, E: np.ndarray) -> np.ndarray:
        T, L = E.shape
        alpha = np.zeros((T, L))
        alpha[0] = self.w_start + E[0]
        for t in range(1, T):
            alpha[t] = E[t] + _logsumexp_cols(alpha[t - 1][:, None] + self.w_trans)
        return alpha

    def _beta(self, E: np.ndarray) -> np.ndarray:
        T, L = E.shape
        beta = np.zeros((T, L))
        for t in range(T - 2, -1, -1):
            beta[t] = _logsumexp_rows(self.w_trans + (E[t + 1] + beta[t + 1])[None, :])
        return beta

    # ---------------- persistence ----------------

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        np.savez_compressed(
            buf,
            w_obs=self.w_obs, w_trans=self.w_trans, w_start=self.w_start,
            m_obs=self.m_obs, m_trans=self.m_trans, m_start=self.m_start,
            obs_vocab=np.frombuffer(
                json.dumps(self.obs_vocab).encode(), dtype=np.uint8),
            label_vocab=np.frombuffer(
                json.dumps(self.label_vocab).encode(), dtype=np.uint8),
        )
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "Crf":
        z = np.load(io.BytesIO(raw))
        return cls(
            obs_vocab=json.loads(bytes(z["obs_vocab"]).decode()),
            label_vocab=json.loads(bytes(z["label_vocab"]).decode()),
            w_obs=z["w_obs"], w_trans=z["w_trans"], w_start=z["w_start"],
            m_obs=z["m_obs"], m_trans=z["m_trans"], m_start=z["m_start"],
        )


def _logsumexp(v: np.ndarray) -> float:
    m = np.max(v)
    if m <= NEG_INF:
        return NEG_INF
    return float(m + np.log(np.sum(np.exp(v - m))))


def _logsumexp_cols(mat: np.ndarray) -> np.ndarray:
    m = np.max(mat, axis=0)
    return m + np.log(np.sum(np.exp(mat - m[None, :]), axis=0))


def _logsumexp_rows(mat: np.ndarray) -> np.ndarray:
    m = np.max(mat, axis=1)
    return m + np.log(np.sum(np.exp(mat - m[:, None]), axis=1))


def encode_training(sentences: list[list[set[str]]],
                    labels: list[list[str]]):
    """Build sorted vocabularies, encode sentences, compute presentFeats
    masks (Nerf.hs:90), and return a zero-weight model + encoded data.
    Deterministic (sorted vocab) regardless of input sharding."""
    assert len(sentences) == len(labels)
    obs_vocab: dict[str, int] = {}
    for s in sorted({o for sent in sentences for obs in sent for o in obs}):
        obs_vocab[s] = len(obs_vocab)
    label_vocab: dict[str, int] = {}
    for s in sorted({y for ys in labels for y in ys}):
        label_vocab[s] = len(label_vocab)
    L = len(label_vocab)
    nobs = len(obs_vocab)

    enc_x: list[list[np.ndarray]] = []
    enc_y: list[np.ndarray] = []
    for sent, ys in zip(sentences, labels):
        enc_x.append([np.array(sorted(obs_vocab[o] for o in obs), dtype=np.int64)
                      for obs in sent])
        enc_y.append(np.array([label_vocab[y] for y in ys], dtype=np.int64))

    # presentFeats masks (Nerf.hs:90)
    m_obs = np.zeros((nobs, L), dtype=bool)
    m_trans = np.zeros((L, L), dtype=bool)
    m_start = np.zeros(L, dtype=bool)
    for xs, ys in zip(enc_x, enc_y):
        if len(ys) == 0:
            continue
        m_start[ys[0]] = True
        for t, ids in enumerate(xs):
            m_obs[ids, ys[t]] = True
        m_trans[ys[:-1], ys[1:]] = True

    model = Crf(obs_vocab, label_vocab,
                np.zeros((nobs, L)), np.zeros((L, L)), np.zeros(L),
                m_obs, m_trans, m_start)
    return model, enc_x, enc_y


def batch_gradient(model: Crf, enc_x, enc_y, batch) -> tuple:
    """Log-likelihood gradient (empirical - expected feature counts via
    forward-backward) summed over the sentences indexed by ``batch``."""
    nobs, L = model.w_obs.shape
    g_obs = np.zeros((nobs, L))
    g_trans = np.zeros((L, L))
    g_start = np.zeros(L)
    for si in batch:
        xs, ys = enc_x[si], enc_y[si]
        T = len(xs)
        if T == 0:
            continue
        E = model.emissions(xs)
        alpha = model._alpha(E)
        beta = model._beta(E)
        logZ = _logsumexp(alpha[-1])
        # empirical - expected
        g_start[ys[0]] += 1.0
        g_start -= np.exp(alpha[0] + beta[0] - logZ)
        for t in range(T):
            marg = np.exp(alpha[t] + beta[t] - logZ)
            ids = xs[t]
            if len(ids):
                g_obs[ids, ys[t]] += 1.0
                g_obs[ids] -= marg[None, :]
        for t in range(1, T):
            g_trans[ys[t - 1], ys[t]] += 1.0
            pair = (alpha[t - 1][:, None] + model.w_trans
                    + (E[t] + beta[t])[None, :] - logZ)
            g_trans -= np.exp(pair)
    return g_obs, g_trans, g_start


def apply_update(model: Crf, grads, gain: float, batch_len: int,
                 n_sents: int, reg_var: float) -> None:
    """SGD step with L2 regularization scaled by batch fraction
    (pinned sgd-0.2.3 rule, SURVEY.md §8.3)."""
    g_obs, g_trans, g_start = grads
    reg = batch_len / (n_sents * reg_var)
    model.w_obs += gain * ((g_obs - reg * model.w_obs) * model.m_obs)
    model.w_trans += gain * ((g_trans - reg * model.w_trans) * model.m_trans)
    model.w_start += gain * ((g_start - reg * model.w_start) * model.m_start)


def train(sentences: list[list[set[str]]], labels: list[list[str]],
          args: SgdArgs | None = None) -> Crf:
    """Train from (observation-set sentences, per-token label strings).

    Vocabulary construction and minibatch shuffling are fully seeded, so
    training is reproducible across processes and parallelism levels.
    """
    args = args or SgdArgs()
    model, enc_x, enc_y = encode_training(sentences, labels)
    n_sents = len(sentences)
    rng = np.random.default_rng(args.seed)
    for it in range(args.iter_num):
        gain = args.gain0 * args.tau / (args.tau + it)
        perm = rng.permutation(n_sents)
        for lo in range(0, n_sents, args.batch_size):
            batch = perm[lo:lo + args.batch_size]
            grads = batch_gradient(model, enc_x, enc_y, batch)
            apply_update(model, grads, gain, len(batch), n_sents,
                         args.reg_var)
    return model
