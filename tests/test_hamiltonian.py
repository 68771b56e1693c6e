"""Hamiltonian builder tests (mirrors reference
``test/test_hamiltonian.jl``): drift summation, duplicate-amplitude
merging, static-coefficient downgrade to Operator, plain-op downgrade."""

import jax.numpy as jnp
import numpy as np
import pytest

from quantumpropagators import Generator, Operator, hamiltonian, get_controls
from quantumpropagators.utils.fixtures import random_matrix


@pytest.fixture
def ops():
    rng = np.random.default_rng(21)
    return [jnp.asarray(random_matrix(8, hermitian=True, rng=rng)) for _ in range(4)]


def test_pure_drift(ops):
    H = hamiltonian(ops[0], ops[1])
    # no amplitudes → plain operator equal to the sum
    assert isinstance(H, jnp.ndarray)
    assert np.allclose(np.asarray(H), np.asarray(ops[0]) + np.asarray(ops[1]))


def test_generator_structure(ops):
    eps1 = lambda t: np.sin(t)
    eps2 = lambda t: np.cos(t)
    H = hamiltonian(ops[0], (ops[1], eps1), (ops[2], eps2))
    assert isinstance(H, Generator)
    assert len(H.ops) == 3
    assert len(H.amplitudes) == 2
    assert H.drift_offset == 1
    assert get_controls(H) == (eps1, eps2)


def test_duplicate_amplitude_merging(ops):
    eps = lambda t: np.sin(t)
    H = hamiltonian(ops[0], (ops[1], eps), (ops[2], eps))
    assert isinstance(H, Generator)
    assert len(H.ops) == 2  # merged
    assert len(H.amplitudes) == 1
    assert np.allclose(
        np.asarray(H.ops[1]), np.asarray(ops[1]) + np.asarray(ops[2])
    )


def test_static_amplitudes_downgrade_to_operator(ops):
    H = hamiltonian(ops[0], (ops[1], 2.5))
    assert isinstance(H, Operator)
    assert np.allclose(
        np.asarray(H.to_dense()), np.asarray(ops[0]) + 2.5 * np.asarray(ops[1])
    )


def test_drift_summed(ops):
    eps = lambda t: t
    H = hamiltonian(ops[0], ops[1], (ops[2], eps))
    assert isinstance(H, Generator)
    assert len(H.ops) == 2
    assert np.allclose(
        np.asarray(H.ops[0]), np.asarray(ops[0]) + np.asarray(ops[1])
    )


def test_no_terms_raises():
    with pytest.raises(ValueError):
        hamiltonian()


def test_reversed_term_warns(ops):
    with pytest.warns(UserWarning):
        with pytest.raises(Exception):
            hamiltonian(ops[0], (lambda t: t, ops[1]))
