"""Target-density protocol (layer L0).

The reference expresses a target as a plain callable
``lpFun(q) -> (logp, grad)`` with hand-written gradients
(``WALNUTSpy/targetDistr.py:18-93``), plus ad-hoc extensions for
Hessians (``targetDistr.py:53-54``) and Hessian-vector products
(``isokinetic/targets.py:12-16``).

Here a target is a pure-JAX scalar log density.  Gradients, HVPs and
Hessians come from autodiff unless an analytic override is supplied,
and every entry point is *batched over chains*: ``logp_grad`` takes
``[..., D]`` and evaluates all chains in one fused XLA computation —
the single hottest op in the whole engine (called once per leapfrog
micro step).
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp


class Target:
    """A differentiable target distribution.

    Args:
        logp: scalar log density taking a single ``[D]`` position.
        dim: dimensionality of the unconstrained parameter vector.
        name: display name.
        generated: optional transform applied to positions before
            storing samples (reference: ``generated`` argument of
            ``WALNUTSpy/WALNUTS.py:113``). Takes ``[..., D]``, batched.
        logp_grad: optional analytic batched ``[..., D] ->
            (lp[...], grad[..., D])`` override.
    """

    def __init__(
        self,
        logp: Callable,
        dim: int,
        name: str = "target",
        generated: Optional[Callable] = None,
        logp_grad: Optional[Callable] = None,
    ):
        self._logp = logp
        self.dim = int(dim)
        self.name = name
        self._generated = generated
        self._logp_grad = logp_grad

    # ------------------------------------------------------------------
    def logp(self, q):
        """Batched log density: ``[..., D] -> [...]``."""
        q = jnp.asarray(q)
        if q.ndim == 1:
            return self._logp(q)
        flat = q.reshape(-1, q.shape[-1])
        out = jax.vmap(self._logp)(flat)
        return out.reshape(q.shape[:-1])

    def logp_grad(self, q):
        """Batched value-and-gradient: ``[..., D] -> ([...], [..., D])``.

        Default implementation differentiates ``sum(logp(batch))`` so a
        whole chain batch costs one forward+backward pass.
        """
        if self._logp_grad is not None:
            return self._logp_grad(q)
        q = jnp.asarray(q)
        if q.ndim == 1:
            return jax.value_and_grad(self._logp)(q)
        lp, vjp = jax.vjp(self.logp, q)
        (grad,) = vjp(jnp.ones_like(lp))
        return lp, grad

    def grad(self, q):
        return self.logp_grad(q)[1]

    def hvp(self, q, v):
        """Hessian-vector product via forward-over-reverse autodiff."""
        return jax.jvp(lambda x: self.logp_grad(x)[1], (q,), (v,))[1]

    def hessian(self, q):
        return jax.hessian(self._logp)(q)

    def hessian_batched(self, q):
        """Batched Hessians: ``[..., D] -> [..., D, D]`` (used by the
        implicit midpoint integrator's Newton mode; reference Hessian
        convention ``targetDistr.py:53-54``)."""
        q = jnp.asarray(q)
        if q.ndim == 1:
            return self.hessian(q)
        flat = q.reshape(-1, q.shape[-1])
        out = jax.vmap(jax.hessian(self._logp))(flat)
        return out.reshape(q.shape[:-1] + out.shape[-2:])

    def generated(self, q):
        if self._generated is None:
            return q
        return self._generated(q)

    @property
    def generated_dim(self):
        if self._generated is None:
            return self.dim
        probe = jax.eval_shape(self._generated, jnp.zeros((1, self.dim)))
        return int(probe.shape[-1])

    def __repr__(self):
        return f"Target({self.name}, dim={self.dim})"
