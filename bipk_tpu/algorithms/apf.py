"""Algorithm 1 — online auxiliary particle filter with joint GP learning.

Every particle carries its own MNIW sufficient statistics per learned
sub-function; each step forgets, looks ahead through the physics skeleton +
GP posterior mean, resamples on first-stage weights, propagates, draws the
interface variables from the per-particle matrix-t predictive, and applies a
rank-1 statistics update.

Behavioral parity: ``Algorithm1`` (``/root/reference/src/Algorithm1.py``).
Architectural deltas (TPU-first):

- the host time loop with one jitted dispatch per step
  (``Algorithm1.py:420``) is a single ``lax.scan`` — one dispatch per sweep;
- ``prior + stats`` is Cholesky-factored **once** per step and the factor is
  gathered through resampling, serving both the auxiliary posterior mean and
  the post-resample matrix-t predictive (the reference factors twice:
  ``Algorithm1.py:212`` and ``:252``);
- all per-particle tensors live **batch-last** (``(m, m, N)`` etc.) so the
  particle batch fills TPU lanes and the unrolled small-matrix factorizations
  in ``ops.batched_linalg`` fuse into single VPU kernels;
- RNG draws are batched over the population (one Student-t / normal call per
  step) instead of per-particle key splits;
- traces accumulate on device; the weighted sufficient-statistics reduction
  the reference performs on host per step (``Algorithm1.py:446-457``) is an
  in-scan contraction.
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from bipk_tpu.models.ssm import GPNode, SSM
from bipk_tpu.ops import batched_linalg as bla
from bipk_tpu.ops import mniw, resampling


class APFResult(NamedTuple):
    """Full-trace result, mirroring ``Algorithm1.__call__``'s returns
    (``/root/reference/src/Algorithm1.py:483-492``)."""

    states: jax.Array  # (T, N, dx)
    int_vars: tuple  # each (T, N, n_i)
    stats_mean: tuple  # each MNIW with leading (T, ...) — weighted means
    weights: jax.Array  # (T, N) normalized
    ancestors: jax.Array  # (T-1, N)
    final_stats: tuple  # each MNIW with leading (N, ...)
    outputs: jax.Array  # (T, N, dy)
    log_likelihood: jax.Array  # (T, N)
    ess: jax.Array  # (T,)


def _as_tuple(x) -> tuple:
    return tuple(x) if isinstance(x, (tuple, list)) else (x,)


class APFKernel:
    """Shared batch-last building blocks for APF-family sweeps.

    Everything is closed over statically (model callables, noise Choleskys,
    priors); methods take/return batch-last tensors: ``state (dx, N)``,
    ``int_vars`` tuple of ``(n_i, N)``, ``stats`` tuple of batch-last MNIW.
    """

    _PACKED_GATHER_MAX_N = 262144

    def __init__(self, ssm: SSM, gps: Sequence[GPNode], dtype, mesh=None):
        self.ssm = ssm
        self.gps = _as_tuple(gps)
        self.n_gp = len(self.gps)
        self.dtype = dtype
        # GSPMD auto-partitioning over a mesh: pallas_call cannot be
        # partitioned by the SPMD partitioner, so multi-device meshes take
        # the XLA fallback kernels
        self.mesh = mesh
        self.use_pallas = (
            False if (mesh is not None and mesh.devices.size > 1) else None
        )
        # Factor reuse (auxiliary kernel emits [tril(L)|white]; the
        # gather/draw kernel consumes it instead of refactorizing):
        # MEASURED AND RETIRED as a default. Emitting is free (the aux
        # kernel is compute-bound: 119.5 vs 118.9 us at m = 20,
        # N = 32768 on v5e), but the consuming draw must gather a second
        # ~tri(m)-row payload through its lane window and measures
        # SLOWER than refactorizing (601 vs 481 us) — the O(m^3/6)
        # refactorization it saves is cheaper than the extra gather
        # traffic. Kept opt-in (BIPK_REUSE_FACTOR=1) with a bitwise
        # parity test (tests/test_pallas_kernels.py).
        self.reuse_factor = bool(os.environ.get("BIPK_REUSE_FACTOR"))
        self.priors = tuple(gp.prior_as(dtype) for gp in self.gps)
        self.ms = tuple(p.T1.shape[0] for p in self.priors)
        self.ns = tuple(p.T2.shape[0] for p in self.priors)
        # batch-last broadcastable priors
        self.priors_bl = tuple(
            mniw.MNIW(p.T0[..., None], p.T1[..., None], p.T2[..., None], p.T3)
            for p in self.priors
        )
        self.process_chol = (
            None if ssm.is_deterministic else ssm.process_chol(dtype)
        )
        self.output_chol = ssm.output_chol(dtype)
        self._out_logdet = jnp.sum(
            jnp.log(jnp.diagonal(self.output_chol))
        )

    # -- model evaluation (vmapped over the trailing particle axis) --------

    def transition_all(self, state, inp, int_vars):
        return jax.vmap(
            lambda x, *iv: self.ssm.transition(x, inp, *iv),
            in_axes=-1,
            out_axes=-1,
        )(state, *int_vars)

    def output_all(self, state, inp, int_vars):
        return jax.vmap(
            lambda x, *iv: jnp.atleast_1d(self.ssm.output(x, inp, *iv)),
            in_axes=-1,
            out_axes=-1,
        )(state, *int_vars)

    def basis_all(self, i, state, inp):
        # The batch-last basis looks like strictly less work (no
        # compute-then-transpose) but measured 0.79 -> 0.99 s/sweep on
        # the vehicle Gibbs bench — the (m, d, N) product intermediate
        # breaks XLA's fusion around the cSMC ancestor-weight graph —
        # while staying neutral on the APF headline. Opt-in for
        # re-evaluation on future compilers.
        if self.gps[i].basis_fn_bl is not None and os.environ.get(
            "BIPK_BL_BASIS"
        ):
            return self.gps[i].basis_fn_bl(state, inp)
        return jax.vmap(
            lambda x: self.gps[i].basis_fn(x, inp), in_axes=-1, out_axes=-1
        )(state)

    def log_lik_all(self, obs, state, inp, int_vars):
        out = self.output_all(state, inp, int_vars)  # (dy, N)
        resid = out - obs[:, None]
        white = bla.solve_lower_bl(self.output_chol, resid)
        dy = white.shape[0]
        quad = jnp.sum(white * white, axis=0)
        return (
            -0.5 * (dy * jnp.log(2.0 * jnp.asarray(jnp.pi, self.dtype)) + quad)
            - self._out_logdet
        )

    def propagate_all(self, key, state, inp, int_vars):
        nxt = self.transition_all(state, inp, int_vars)
        if self.process_chol is None:
            return nxt
        z = jax.random.normal(key, nxt.shape, self.dtype)
        return nxt + jnp.tensordot(self.process_chol, z, axes=1)

    # -- init ----------------------------------------------------------------

    def init_particles(self, key, n_particles, inputs0, init_mean, init_cov):
        """Initial particles/statistics, batch-last.

        Parity with ``Algorithm1._init_algorithm``
        (``/root/reference/src/Algorithm1.py:100-177``).
        """
        key, key_state = jax.random.split(key)
        mean = jnp.asarray(init_mean, dtype=self.dtype)
        chol = bla.chol_lower(
            jnp.asarray(jnp.atleast_2d(init_cov), dtype=self.dtype)
        )
        z = jax.random.normal(key_state, (mean.shape[0], n_particles), self.dtype)
        state = mean[:, None] + chol @ z

        int_vars = []
        for gp in self.gps:
            key, key_iv = jax.random.split(key)
            gmean = jnp.asarray(jnp.atleast_1d(gp.init_mean), dtype=self.dtype)
            gchol = gp.init_chol(self.dtype)
            z = jax.random.normal(
                key_iv, (gmean.shape[0], n_particles), self.dtype
            )
            int_vars.append(gmean[:, None] + gchol @ z)
        int_vars = tuple(int_vars)

        stats = tuple(
            mniw.suff_stat_bl(
                int_vars[i], self.basis_all(i, state, inputs0)
            )
            for i in range(self.n_gp)
        )
        log_weights = jnp.zeros((n_particles,), dtype=self.dtype)
        return log_weights, state, int_vars, stats

    # -- per-step pieces -------------------------------------------------------

    def constrain(self, tree):
        """Pin the particle (last) axis sharding under GSPMD."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        from bipk_tpu.parallel.mesh import PARTICLE_AXIS

        def c(a):
            if a.ndim == 0:
                return a
            spec = P(*([None] * (a.ndim - 1) + [PARTICLE_AXIS]))
            return jax.lax.with_sharding_constraint(
                a, NamedSharding(self.mesh, spec)
            )

        return jax.tree_util.tree_map(c, tree)

    def factorize_all(self, stats, lam: float = 1.0):
        """Factor ``prior + lam * stats`` per GP in one fused pass (the
        forgetting scale and prior addition never hit HBM)."""
        return tuple(
            mniw.factorize_scaled_bl(
                stats[i], prior=self.priors[i], lam=lam,
                use_pallas=self.use_pallas,
            )
            for i in range(self.n_gp)
        )

    def auxiliary(self, state, int_vars, factors, inp_prev, inp_cur, obs, log_weights):
        """Look-ahead states + first-stage weights."""
        aux_state = self.transition_all(state, inp_prev, int_vars)
        aux_iv = tuple(
            mniw.factor_mean_at_bl(
                factors[i],
                self.basis_all(i, aux_state, inp_cur),
                use_pallas=self.use_pallas,
            )
            for i in range(self.n_gp)
        )
        ll_aux = self.log_lik_all(obs, aux_state, inp_cur, aux_iv)
        return aux_state, aux_iv, ll_aux + log_weights, ll_aux

    # -- fused factorize+project pieces (the factor never touches HBM) -----

    def projected_all(self, stats, lam, basis):
        """Per-GP fused factorization + predictive projection at ``basis``
        (see ``mniw.factorize_project_bl``)."""
        return tuple(
            mniw.factorize_project_bl(
                stats[i], basis[i], prior=self.priors[i], lam=lam,
                use_pallas=self.use_pallas,
            )
            for i in range(self.n_gp)
        )

    def auxiliary_fused(
        self, stats, lam, state, int_vars, inp_prev, inp_cur, obs,
        log_weights,
    ):
        """Look-ahead states + first-stage weights, with the posterior-mean
        projection fused into the factorization kernel. Returns the
        per-GP :class:`mniw.ProjectedFactor` as the last element (the cSMC
        ancestor weights read its log-determinants)."""
        aux_state = self.transition_all(state, inp_prev, int_vars)
        basis = tuple(
            self.basis_all(i, aux_state, inp_cur) for i in range(self.n_gp)
        )
        fps = self.projected_all(stats, lam, basis)
        aux_iv = tuple(fp.mean for fp in fps)
        ll_aux = self.log_lik_all(obs, aux_state, inp_cur, aux_iv)
        return aux_state, aux_iv, ll_aux + log_weights, ll_aux, fps

    def draw_int_vars_fused(self, key, stats_g, lam, new_state, inp_cur):
        """Predictive matrix-t draws with factorization + projection fused
        (post-resampling factors are a deterministic function of the
        gathered statistics — never materialized or gathered)."""
        new_basis = tuple(
            self.basis_all(i, new_state, inp_cur) for i in range(self.n_gp)
        )
        fps = self.projected_all(stats_g, lam, new_basis)
        keys = jax.random.split(key, self.n_gp)
        new_iv = tuple(
            mniw.sample_projected_bl(keys[i], fps[i], self.dtype)
            for i in range(self.n_gp)
        )
        return new_iv, new_basis

    # -- packed-statistics pieces (ONE (rows, N) matrix per GP) -----------

    def projected_all_packed(self, Ss, lam, basis, emit_factor=False):
        """Per-GP fused factorization + predictive projection over the
        packed statistics carry (see ``mniw.factorize_project_packed_bl``).
        With ``emit_factor`` returns ``(fps, lws)`` where ``lws`` carries
        each GP's packed ``[tril(L)|white]`` factor (entries may be None
        when the factor pair is unavailable)."""
        if not emit_factor:
            return tuple(
                mniw.factorize_project_packed_bl(
                    Ss[i], basis[i], prior=self.priors[i], lam=lam,
                    m=self.ms[i], n=self.ns[i], use_pallas=self.use_pallas,
                )
                for i in range(self.n_gp)
            )
        outs = tuple(
            mniw.factorize_project_packed_bl(
                Ss[i], basis[i], prior=self.priors[i], lam=lam,
                m=self.ms[i], n=self.ns[i], use_pallas=self.use_pallas,
                emit_factor=True,
            )
            for i in range(self.n_gp)
        )
        return tuple(o[0] for o in outs), tuple(o[1] for o in outs)

    def auxiliary_fused_packed(
        self, Ss, lam, state, int_vars, inp_prev, inp_cur, obs, log_weights,
    ):
        """:meth:`auxiliary_fused` over the packed statistics carry."""
        out = self.auxiliary_fused_packed_f(
            Ss, lam, state, int_vars, inp_prev, inp_cur, obs, log_weights,
            emit_factor=False,
        )
        return out[:5]

    def auxiliary_fused_packed_f(
        self, Ss, lam, state, int_vars, inp_prev, inp_cur, obs, log_weights,
        emit_factor=True,
    ):
        """:meth:`auxiliary_fused_packed` that also returns the per-GP
        packed factors ``lws`` (6th element) for reuse by the
        factor-consuming draw kernel — the O(m^3/6) per-particle
        refactorization in the draw step is the sweep's dominant compute
        term, and the auxiliary kernel has just computed the same factor."""
        aux_state = self.transition_all(state, inp_prev, int_vars)
        basis = tuple(
            self.basis_all(i, aux_state, inp_cur) for i in range(self.n_gp)
        )
        if emit_factor:
            fps, lws = self.projected_all_packed(
                Ss, lam, basis, emit_factor=True
            )
        else:
            fps = self.projected_all_packed(Ss, lam, basis)
            lws = (None,) * self.n_gp
        aux_iv = tuple(fp.mean for fp in fps)
        ll_aux = self.log_lik_all(obs, aux_state, inp_cur, aux_iv)
        return aux_state, aux_iv, ll_aux + log_weights, ll_aux, fps, lws

    def draw_update_gather_all_packed(
        self, key, Ss, ancestors, lam, new_state, inp_cur, factors=None,
        fused=None,
    ):
        """:meth:`draw_update_all_packed` with the resampling gather fused
        into the kernel: takes the PRE-resampling packed statistics plus
        the (non-decreasing) ancestor indices; the gathered statistics
        never exist in HBM (see ``mniw.draw_update_gather_packed_bl``).
        ``factors`` (from :meth:`auxiliary_fused_packed_f`) lets the
        kernel reuse the auxiliary factorization instead of re-deriving
        it. ``fused=False`` forces the unconditional separate-gather
        path (no lax.cond — the chunked 1M mode pays ~2.4 ms of cond
        overhead + boundary copies PER CHUNK otherwise)."""
        new_basis = tuple(
            self.basis_all(i, new_state, inp_cur) for i in range(self.n_gp)
        )
        keys = jax.random.split(key, self.n_gp)
        outs = None
        if fused is None and self.n_gp > 1 and os.environ.get(
            "BIPK_MERGED_COND"
        ):
            # MERGED dispatch (opt-in, measured NEUTRAL on the vehicle
            # headline: 30.95M psps merged vs 31.12M per-GP, within day
            # variance — XLA evidently already CSEs the identical fits
            # predicates across the per-GP conds): every GP shares the
            # SAME ancestor vector, so their windowed-gather `fits`
            # predicates are identical — one lax.cond over all GPs
            # instead of one per GP, with unchanged branch bodies (fused
            # and fallback are bitwise-identical computations, so an
            # AND-of-fits dispatch is result-preserving even if
            # predicates ever diverged). Kept for re-testing on future
            # compilers where cond fixed overhead dominates.
            parts = [
                mniw.draw_update_gather_packed_bl(
                    keys[i], Ss[i], ancestors, new_basis[i],
                    prior=self.priors[i], lam=lam, m=self.ms[i],
                    n=self.ns[i], use_pallas=self.use_pallas,
                    factor=None if factors is None else factors[i],
                    fused=fused, _parts=True,
                )
                for i in range(self.n_gp)
            ]
            if all(p is not None for p in parts):
                fits_all = parts[0][0]
                for p in parts[1:]:
                    fits_all = jnp.logical_and(fits_all, p[0])
                outs = jax.lax.cond(
                    fits_all,
                    lambda _: tuple(p[1](None) for p in parts),
                    lambda _: tuple(p[2](None) for p in parts),
                    None,
                )
        if outs is None:
            outs = tuple(
                mniw.draw_update_gather_packed_bl(
                    keys[i], Ss[i], ancestors, new_basis[i],
                    prior=self.priors[i], lam=lam, m=self.ms[i],
                    n=self.ns[i], use_pallas=self.use_pallas,
                    factor=None if factors is None else factors[i],
                    fused=fused,
                )
                for i in range(self.n_gp)
            )
        Ss_new = tuple(o[0] for o in outs)
        new_iv = tuple(o[1] for o in outs)
        lds = tuple((o[2], o[3]) for o in outs)
        return Ss_new, new_iv, new_basis, lds

    def draw_update_all_packed(self, key, Ss_g, lam, new_state, inp_cur):
        """Fused predictive draw + rank-1 statistics update per GP over
        the packed carry: ONE kernel per GP computes the factor, draws the
        interface variable, and writes ``lam*stats + suff`` — no separate
        update pass, no materialized outer products (see
        ``mniw.draw_update_packed_bl``). Returns
        ``(Ss_new, new_iv, new_basis, lds)``."""
        new_basis = tuple(
            self.basis_all(i, new_state, inp_cur) for i in range(self.n_gp)
        )
        keys = jax.random.split(key, self.n_gp)
        outs = tuple(
            mniw.draw_update_packed_bl(
                keys[i], Ss_g[i], new_basis[i], prior=self.priors[i],
                lam=lam, m=self.ms[i], n=self.ns[i],
                use_pallas=self.use_pallas,
            )
            for i in range(self.n_gp)
        )
        Ss_new = tuple(o[0] for o in outs)
        new_iv = tuple(o[1] for o in outs)
        lds = tuple((o[2], o[3]) for o in outs)
        return Ss_new, new_iv, new_basis, lds

    @staticmethod
    def gather_packed(Ss, idx, sorted_indices=False):
        """Resampling gather of the packed statistics matrices: one 2-D
        lane-gather per GP, no concatenate/split."""
        return tuple(
            S.at[:, idx].get(indices_are_sorted=sorted_indices) for S in Ss
        )

    def weighted_stats_packed(self, Ss, weights):
        """Importance-weighted statistics means from the packed carry,
        returned in structured (m, n) matrix form."""
        out = []
        for i, S in enumerate(Ss):
            red = jnp.tensordot(S, weights, axes=(-1, 0))
            out.append(mniw.unpack_reduced(red, self.ms[i], self.ns[i]))
        return tuple(out)

    def draw_int_vars(self, key, factors_res, new_state, inp_cur):
        keys = jax.random.split(key, self.n_gp)
        new_basis = tuple(
            self.basis_all(i, new_state, inp_cur) for i in range(self.n_gp)
        )
        new_iv = tuple(
            mniw.sample_predictive_bl(
                keys[i], factors_res[i], new_basis[i],
                use_pallas=self.use_pallas,
            )
            for i in range(self.n_gp)
        )
        return new_iv, new_basis

    def update_stats(self, stats_res, new_iv, new_basis, lam: float = 1.0):
        """Rank-1 statistics update ``lam * stats + suff_stat`` (the
        forgetting scale fuses into the existing read-modify-write).
        Handles structured and flat statistics layouts."""
        flat = stats_res[0].T1.ndim == 2
        if flat:
            # measured on v5e (vehicle workload): the gather lowering of
            # the flat rank-1 term wins in the forgetting-APF step (8.17M
            # vs 7.97M psps); the fused broadcast lowering wins in the
            # lam=1 cSMC step (1.19 vs 1.57 s/sweep) — see
            # mniw.suff_stat_flat_bl
            def suff(y_, phi_):
                return mniw.suff_stat_flat_bl(
                    y_, phi_, via_gather=(lam != 1.0)
                )
        else:
            suff = mniw.suff_stat_bl
        if lam == 1.0:
            return tuple(
                stats_res[i] + suff(new_iv[i], new_basis[i])
                for i in range(self.n_gp)
            )
        return tuple(
            jax.tree_util.tree_map(
                lambda s, d: s * lam + d,
                stats_res[i],
                suff(new_iv[i], new_basis[i]),
            )
            for i in range(self.n_gp)
        )

    @staticmethod
    def gather(tree, idx):
        """Resampling gather along the particle (last) axis.

        XLA lowers gathers of >2-D operands on TPU ~10x slower than 2-D
        ones (measured 128 of 154 ms/step at N = 131072 in 3-D form vs
        ~3.5 ms per 210 MB tensor in 2-D form). Leading axes share the
        physical tile layout with their merged form, so flattening to
        ``(m*m, N)`` is free — gather there, reshape back.
        """

        def g(a):
            if a.ndim <= 2:
                return jnp.take(a, idx, axis=-1)
            flat = a.reshape(-1, a.shape[-1])
            return jnp.take(flat, idx, axis=-1).reshape(
                a.shape[:-1] + idx.shape
            )

        return jax.tree_util.tree_map(g, tree)

    @staticmethod
    def packed_gather(tree, idx):
        """Resampling gather of a whole pytree with ONE TPU gather op.

        Each gather on TPU is a dynamic cross-lane shuffle whose cost is
        dominated by a per-op floor (~0.26 ms at N = 32768 on v5e even for
        a (N,) vector), so the ~20 separate per-leaf gathers of a filter
        step cost far more than their bytes. Flatten every leaf to rows,
        concatenate into one (K, N) matrix, gather once, split back.
        Profiled on the vehicle APF: 9.2 -> ~5 ms/step at N = 32768.

        Above ``_PACKED_GATHER_MAX_N`` particles the per-op floor is
        amortized and every gather is bandwidth-bound — there the
        concatenate is a pure extra pass over the payload (and two extra
        live copies of it, an OOM at 1M particles), so the per-leaf path
        wins and is used instead.
        """
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        n = leaves[0].shape[-1]
        if n >= APFKernel._PACKED_GATHER_MAX_N:
            return APFKernel.gather(tree, idx)
        rows = [
            leaf.reshape((-1, n)) if leaf.ndim != 2 else leaf
            for leaf in leaves
        ]
        sizes = [r.shape[0] for r in rows]
        packed = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
        took = jnp.take(packed, idx, axis=-1)
        offsets = []
        total = 0
        for s in sizes[:-1]:
            total += s
            offsets.append(total)
        parts = jnp.split(took, offsets, axis=0) if offsets else [took]
        outs = [
            p.reshape(leaf.shape[:-1] + idx.shape)
            for p, leaf in zip(parts, leaves)
        ]
        return jax.tree_util.tree_unflatten(treedef, outs)

    def weighted_stats(self, stats, weights):
        """Importance-weighted mean of per-particle statistics (host-side
        per-step einsum in the reference, ``Algorithm1.py:446-457``).
        Accepts structured or flat statistics; the (small) reduced means
        are always returned in matrix form."""
        flat = stats[0].T1.ndim == 2
        out = tuple(
            jax.tree_util.tree_map(
                lambda s: jnp.tensordot(s, weights, axes=(-1, 0)), st
            )
            for st in stats
        )
        if not flat:
            return out
        return tuple(
            mniw.MNIW(
                st.T0.reshape(self.priors[i].T0.shape),
                st.T1.reshape(self.priors[i].T1.shape),
                st.T2.reshape(self.priors[i].T2.shape),
                st.T3,
            )
            for i, st in enumerate(out)
        )


def build_apf(
    ssm: SSM,
    gps: Sequence[GPNode],
    n_particles: int,
    forgetting_factor: float = 1.0,
    dtype=jnp.float32,
    mesh=None,
) -> Callable:
    """Build the fused online APF sweep.

    Returns ``run(key, observations, inputs, init_state_mean,
    init_state_cov) -> APFResult``. Shapes: ``observations (T, dy)``,
    ``inputs (T, du)`` (``du`` may be 0). With ``mesh`` the particle axis
    is sharding-constrained over it and XLA's SPMD partitioner distributes
    the sweep (exact single-chip semantics, automatic collectives).

    ``mesh`` is a validation path, not a production one: ``pallas_call``
    cannot be partitioned by the SPMD partitioner, so a multi-device mesh
    diverts every fused kernel to the XLA fallbacks — measured **27x**
    slower per chip (24.53M vs 0.90M particle-steps/s, v5e-1, N=32768;
    ``benchmarks/bench_gspmd_cliff.py``). Production multi-chip runs use
    the shard_map paths in ``bipk_tpu.parallel`` (fused kernels per shard,
    ``resampling_scheme="exact"`` for bit-level global-resampling parity),
    which the entry scripts' ``--mesh N`` flag already selects.
    """
    kern = APFKernel(ssm, gps, dtype, mesh=mesh)
    n_gp = kern.n_gp

    def step(carry, xs):
        log_weights, state, int_vars, Ss = carry
        log_weights, state, int_vars, Ss = kern.constrain(
            (log_weights, state, int_vars, Ss)
        )
        obs, inp_prev, inp_cur, key = xs

        # statistics time update (exponential forgetting) fused into the
        # factorization kernels and the fused draw+update — the carried
        # stats are scaled lazily, never in a standalone HBM pass; the
        # factorization + posterior-mean projection run as one fused kernel
        # whose m^2-sized factor never leaves VMEM
        aux_state, aux_iv, lw_aux, ll_aux, _, lws = (
            kern.auxiliary_fused_packed_f(
                Ss, forgetting_factor, state, int_vars, inp_prev, inp_cur,
                obs, log_weights, emit_factor=kern.reuse_factor,
            )
        )

        key, key_res = jax.random.split(key)
        ancestors = resampling.systematic(key_res, jax.nn.softmax(lw_aux))

        # small payloads (state, interface vars, aux log-liks, ~10 rows)
        # gather through XLA; the dominant payload (packed per-particle
        # statistics, hundreds of rows per GP) never does — its resampling
        # gather is fused into the draw/update kernel below
        state_g, iv_g, ll_aux_g = kern.packed_gather(
            (state, int_vars, ll_aux), ancestors
        )

        key, key_state = jax.random.split(key)
        new_state = kern.propagate_all(key_state, state_g, inp_prev, iv_g)

        # fused resampling gather + draw + rank-1 statistics update: ONE
        # kernel per GP reads each output particle's ancestor column
        # (systematic ancestors are non-decreasing, so a block's ancestors
        # live in a small lane window), re-derives the factor, draws the
        # interface variables, and writes the updated packed statistics —
        # the gathered statistics and suff-stat outer products never hit
        # HBM (five HBM passes over the statistics per step -> three)
        key, key_iv = jax.random.split(key)
        Ss_new, new_iv, new_basis, _ = kern.draw_update_gather_all_packed(
            key_iv, Ss, ancestors, forgetting_factor, new_state, inp_cur,
            factors=lws,
        )

        ll_new = kern.log_lik_all(obs, new_state, inp_cur, new_iv)
        new_log_weights = ll_new - ll_aux_g

        norm_w = jax.nn.softmax(new_log_weights)
        emits = (
            new_state.T,
            tuple(iv.T for iv in new_iv),
            new_log_weights,
            ancestors,
            kern.weighted_stats_packed(Ss_new, norm_w),
            1.0 / jnp.sum(norm_w * norm_w),
        )
        return (new_log_weights, new_state, new_iv, Ss_new), emits

    def run(key, observations, inputs, init_state_mean, init_state_cov):
        observations = jnp.atleast_2d(
            jnp.asarray(observations, dtype=dtype).T
        ).T
        inputs = jnp.asarray(inputs, dtype=dtype)
        n_steps = observations.shape[0]

        key, key_init = jax.random.split(key)
        log_w0, state0, iv0, stats0 = kern.init_particles(
            key_init, n_particles, inputs[0], init_state_mean, init_state_cov
        )

        keys = jax.random.split(key, n_steps - 1)
        xs = (observations[1:], inputs[:-1], inputs[1:], keys)
        # statistics ride the scan as ONE packed (rows, N) matrix per GP:
        # near-zero TPU tile padding, a single resampling lane-gather, and
        # no relayout copies between the step's passes
        carry0 = (
            log_w0, state0, iv0,
            tuple(mniw.pack_stats_bl(st) for st in stats0),
        )
        carry, emits = jax.lax.scan(step, carry0, xs)
        state_tr, iv_tr, log_w_tr, ancestors, stats_mean_tr, ess_tr = emits
        final_stats_bl = tuple(
            mniw.from_flat_bl(
                mniw.unpack_stats_bl(S, kern.ms[i], kern.ns[i]),
                kern.ms[i], kern.ns[i],
            )
            for i, S in enumerate(carry[3])
        )

        states = jnp.concatenate([state0.T[None], state_tr])
        int_vars = tuple(
            jnp.concatenate([iv0[i].T[None], iv_tr[i]]) for i in range(n_gp)
        )
        log_weights = jnp.concatenate([log_w0[None], log_w_tr])
        w0 = jax.nn.softmax(log_w0)
        stats_mean = tuple(
            jax.tree_util.tree_map(
                lambda first, rest: jnp.concatenate([first[None], rest]),
                kern.weighted_stats((stats0[i],), w0)[0],
                stats_mean_tr[i],
            )
            for i in range(n_gp)
        )
        ess = jnp.concatenate([(1.0 / jnp.sum(w0 * w0))[None], ess_tr])
        weights = jax.nn.softmax(log_weights, axis=1)
        final_stats = tuple(
            mniw.from_batch_last(st) for st in final_stats_bl
        )

        # final vmapped output / log-likelihood evaluation over all traces
        # (parity: /root/reference/src/Algorithm1.py:462-481)
        def out_and_ll(obs, x_t, inp, ivs_t):
            out = kern.output_all(x_t.T, inp, tuple(v.T for v in ivs_t))
            resid = out - obs[:, None]
            white = bla.solve_lower_bl(kern.output_chol, resid)
            dy = white.shape[0]
            ll = (
                -0.5
                * (dy * jnp.log(2.0 * jnp.asarray(jnp.pi, dtype))
                   + jnp.sum(white * white, axis=0))
                - kern._out_logdet
            )
            return out.T, ll

        outputs, log_lik = jax.vmap(out_and_ll)(
            observations, states, inputs, int_vars
        )

        return APFResult(
            states=states,
            int_vars=int_vars,
            stats_mean=stats_mean,
            weights=weights,
            ancestors=ancestors,
            final_stats=final_stats,
            outputs=outputs,
            log_likelihood=log_lik,
            ess=ess,
        )

    return run


# -- batch-first helpers kept for reference-style baselines/tests -----------


def init_particles(
    key,
    ssm: SSM,
    gps: Sequence[GPNode],
    n_particles: int,
    inputs0,
    init_state_mean,
    init_state_cov,
    dtype,
):
    """Batch-first initial particles (used by the CPU baseline harness)."""
    kern = APFKernel(ssm, gps, dtype)
    log_w, state, int_vars, stats = kern.init_particles(
        key, n_particles, inputs0, init_state_mean, init_state_cov
    )
    return (
        log_w,
        state.T,
        tuple(iv.T for iv in int_vars),
        tuple(mniw.from_batch_last(st) for st in stats),
    )


def weighted_stats(stats: tuple, weights: jax.Array) -> tuple:
    """Batch-first importance-weighted statistics mean."""
    return tuple(
        jax.tree_util.tree_map(
            lambda s: jnp.einsum("n...,n->...", s, weights), st
        )
        for st in stats
    )
