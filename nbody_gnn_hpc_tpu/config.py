"""Training/experiment configuration.

Parity target: ``src/ai/config.py:4-45`` in the reference — the same
hyperparameter names and defaults, so persisted ``models/config.json`` files
round-trip between the two frameworks.  ``get_device`` reports the JAX
backend instead of cuda/mps/cpu.
"""

from dataclasses import dataclass, asdict, fields


@dataclass
class TrainingConfig:
    """Hyperparameters for the N-body GNN pipeline (reference defaults).

    Note the reference's documented config drift (SURVEY §5): ``dt = 0.01``
    here, but the actual datagen/eval pipeline hardcodes ``dt = 0.001``
    (reference ``generate_data.py:39``, ``evaluate.py:87``).  We preserve the
    CLI behavior (0.001) and keep this field for config-file parity.
    """

    # Training
    batch_size: int = 24
    learning_rate: float = 5e-4
    epochs: int = 200
    early_stopping: int = 30

    # Model
    hidden_dim: int = 256
    n_layers: int = 6
    k_neighbors: int = 40
    dropout: float = 0.1

    # Regularization
    weight_decay: float = 1e-4
    noise_std: float = 0.003  # Input noise injection during training

    # Data generation
    particles: int = 200
    simulations: int = 300
    steps: int = 400
    dt: float = 0.01

    # Experiment
    test_size: float = 0.2
    n_test_sims: int = 10
    workers: int = 4
    sequence_length: int = 10

    @staticmethod
    def get_device() -> str:
        """Return the active JAX backend platform (e.g. 'tpu', 'cpu')."""
        import jax

        return jax.default_backend()

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "TrainingConfig":
        """Build a config from a dict, ignoring unknown keys (forward compat)."""
        known = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})
