"""Pallas kernels validated in interpreter mode against the XLA paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestCavityKernel:
    def test_occupancy_matches_dense(self):
        from mpmcxx_tpu.ops.pallas_cavity import occupancy_pallas
        rng = np.random.default_rng(0)
        P, A = 300, 70
        points = jnp.asarray(rng.uniform(-10, 10, (P, 3)))
        pos = jnp.asarray(rng.uniform(-10, 10, (A, 3)))
        alive = jnp.asarray(rng.uniform(size=A) < 0.8)
        r = 2.4
        got = occupancy_pallas(points, pos, alive, r, interpret=True)
        d = points[:, None, :] - pos[None, :, :]
        want = jnp.any((jnp.sum(d * d, -1) < r * r) & alive[None, :], axis=1)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestContractKernel:
    def test_contract_matches_xla_planes(self):
        from mpmcxx_tpu.ops import pallas_polar
        rng = np.random.default_rng(1)
        A = 256
        assert pallas_polar.supported(A)

        def sym(mat):
            return jnp.asarray((mat + mat.T) / 2, jnp.float32)

        def antisym(mat):
            return jnp.asarray((mat - mat.T) / 2, jnp.float32)

        co = sym(rng.normal(size=(A, A)) * 0.01)
        cd = sym(rng.normal(size=(A, A)) * 0.02)
        dx = antisym(rng.normal(size=(A, A)))
        dy = antisym(rng.normal(size=(A, A)))
        dz = antisym(rng.normal(size=(A, A)))
        mu = jnp.asarray(rng.normal(size=(A, 3)) * 0.1)

        got = pallas_polar.contract_pallas((co, cd, dx, dy, dz), mu,
                                           interpret=True)
        m = mu.astype(jnp.float32)
        mx, my, mz = m[:, 0][None, :], m[:, 1][None, :], m[:, 2][None, :]
        s = co * (dx * mx + dy * my + dz * mz)
        want = -jnp.stack([jnp.sum(s * dx + cd * mx, 1),
                           jnp.sum(s * dy + cd * my, 1),
                           jnp.sum(s * dz + cd * mz, 1)], 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

        # folded 4-plane form: the kernel must reproduce the 5-plane
        # contraction for co_eff = min(co, 0) via s = sqrt(-co_eff) d
        co_eff = jnp.minimum(co, 0.0)
        w = jnp.sqrt(-co_eff)
        got4 = pallas_polar.contract_pallas(
            (cd, w * dx, w * dy, w * dz), mu, interpret=True)
        s4 = co_eff * (dx * mx + dy * my + dz * mz)
        want4 = -jnp.stack([jnp.sum(s4 * dx + cd * mx, 1),
                            jnp.sum(s4 * dy + cd * my, 1),
                            jnp.sum(s4 * dz + cd * mz, 1)], 1)
        np.testing.assert_allclose(np.asarray(got4), np.asarray(want4),
                                   rtol=1e-4, atol=1e-5)

    def test_contract_3plane_in_kernel_coeffs(self):
        """3-plane mode (exponential damping): the kernel recomputes
        (co, cd) in-kernel from the masked displacements and must match
        the host-side coeffs_from_d + 5-plane contraction."""
        from mpmcxx_tpu.ops import pallas_polar, polar
        rng = np.random.default_rng(9)
        A = 256
        l = jnp.float32(2.1304)
        d = rng.normal(size=(A, A, 3)) * 4.0
        d = d - np.transpose(d, (1, 0, 2))          # antisymmetric
        mask = rng.uniform(size=(A, A)) < 0.9
        mask = mask & mask.T
        np.fill_diagonal(mask, False)               # self pairs
        dm = jnp.asarray(np.where(mask[..., None], d, 0.0), jnp.float32)
        dmx, dmy, dmz = dm[..., 0], dm[..., 1], dm[..., 2]
        mu = jnp.asarray(rng.normal(size=(A, 3)) * 0.1)

        co, cd = polar.coeffs_from_d(dmx, dmy, dmz, l)
        m = mu.astype(jnp.float32)
        mx, my, mz = m[:, 0][None, :], m[:, 1][None, :], m[:, 2][None, :]
        s = co * (dmx * mx + dmy * my + dmz * mz)
        want = -jnp.stack([jnp.sum(s * dmx + cd * mx, 1),
                           jnp.sum(s * dmy + cd * my, 1),
                           jnp.sum(s * dmz + cd * mz, 1)], 1)
        for fn in (pallas_polar.contract_pallas,
                   pallas_polar.contract_pallas_sym):
            got = fn((dmx, dmy, dmz), mu, l=l, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-6)

    def test_coeffs_from_d_matches_f64_over_physical_range(self):
        """The in-kernel f32 coefficient recompute must track the host
        f64 formulas (ops.polar._thole_damps exponential branch) to
        ~1e-5 relative across the physical pair-distance range — the
        1 - e^-x * poly cancellation is mild for x = l*r >~ 1 and the
        coefficients themselves vanish as r -> 0."""
        from mpmcxx_tpu.ops import polar
        l = 2.1304
        r = np.logspace(np.log10(0.5), np.log10(60.0), 400)
        # f64 reference (the mixed_coeff_scalars formulas)
        x = l * r
        ex = np.exp(-x)
        damp1 = 1.0 - ex * (0.5 * x * x + x + 1.0)
        damp2 = damp1 - ex * x ** 3 / 6.0
        co64 = -3.0 * damp2 / r ** 5
        cd64 = damp1 / r ** 3
        # f32 in-kernel path on axis-aligned displacements
        d = jnp.asarray(r, jnp.float32)
        z = jnp.zeros_like(d)
        co32, cd32 = polar.coeffs_from_d(d, z, z, jnp.float32(l))
        np.testing.assert_allclose(np.asarray(co32, np.float64), co64,
                                   rtol=2e-5)
        np.testing.assert_allclose(np.asarray(cd32, np.float64), cd64,
                                   rtol=2e-5)
        # masked pairs: d == 0 must yield exactly zero
        co0, cd0 = polar.coeffs_from_d(z, z, z, jnp.float32(l))
        assert float(jnp.max(jnp.abs(co0))) == 0.0
        assert float(jnp.max(jnp.abs(cd0))) == 0.0

    def test_column_tiling_accumulation(self, monkeypatch):
        # cap the column tile to force multiple j-iterations: the
        # accumulation path must produce the same totals
        from mpmcxx_tpu.ops import pallas_polar
        monkeypatch.setattr(pallas_polar, "BC_MAX", 128)
        rng = np.random.default_rng(2)
        A = 384
        co = jnp.asarray(rng.normal(size=(A, A)), jnp.float32) * 0.01
        cd = jnp.asarray(rng.normal(size=(A, A)), jnp.float32) * 0.01
        dx = jnp.asarray(rng.normal(size=(A, A)), jnp.float32)
        dy = jnp.asarray(rng.normal(size=(A, A)), jnp.float32)
        dz = jnp.asarray(rng.normal(size=(A, A)), jnp.float32)
        mu = jnp.asarray(rng.normal(size=(A, 3)))
        got = pallas_polar.contract_pallas((co, cd, dx, dy, dz), mu,
                                           interpret=True)
        m = mu.astype(jnp.float32)
        mx, my, mz = m[:, 0][None, :], m[:, 1][None, :], m[:, 2][None, :]
        s = co * (dx * mx + dy * my + dz * mz)
        want = -jnp.stack([jnp.sum(s * dx + cd * mx, 1),
                           jnp.sum(s * dy + cd * my, 1),
                           jnp.sum(s * dz + cd * mz, 1)], 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=1e-5)

    def test_sym_contract_matches_xla_planes(self):
        """Triangle kernel: exact vs the XLA contraction for even and odd
        tile counts (wrapped-column pairing + 0.5-weight band)."""
        from mpmcxx_tpu.ops import pallas_polar
        rng = np.random.default_rng(5)

        def sym(mat):
            return jnp.asarray((mat + mat.T) / 2, jnp.float32)

        def antisym(mat):
            return jnp.asarray((mat - mat.T) / 2, jnp.float32)

        for A in (256, 640):   # nr even (2) and odd (5) at b=128
            b = pallas_polar._pick_b_sym(A)
            assert b and A % b == 0
            co = sym(rng.normal(size=(A, A)) * 0.01)
            cd = sym(rng.normal(size=(A, A)) * 0.02)
            dx = antisym(rng.normal(size=(A, A)))
            dy = antisym(rng.normal(size=(A, A)))
            dz = antisym(rng.normal(size=(A, A)))
            mu = jnp.asarray(rng.normal(size=(A, 3)) * 0.1)
            got = pallas_polar.contract_pallas_sym((co, cd, dx, dy, dz), mu,
                                                   interpret=True)
            m = mu.astype(jnp.float32)
            mx, my, mz = m[:, 0][None, :], m[:, 1][None, :], m[:, 2][None, :]
            s = co * (dx * mx + dy * my + dz * mz)
            want = -jnp.stack([jnp.sum(s * dx + cd * mx, 1),
                               jnp.sum(s * dy + cd * my, 1),
                               jnp.sum(s * dz + cd * mz, 1)], 1)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-6)

            # folded 4-plane form on the triangle kernel
            co_eff = jnp.minimum(co, 0.0)
            w = jnp.sqrt(-co_eff)
            got4 = pallas_polar.contract_pallas_sym(
                (cd, w * dx, w * dy, w * dz), mu, interpret=True)
            s4 = co_eff * (dx * mx + dy * my + dz * mz)
            want4 = -jnp.stack([jnp.sum(s4 * dx + cd * mx, 1),
                                jnp.sum(s4 * dy + cd * my, 1),
                                jnp.sum(s4 * dz + cd * mz, 1)], 1)
            np.testing.assert_allclose(np.asarray(got4), np.asarray(want4),
                                       rtol=1e-4, atol=1e-5)

    def test_tri_contract_matches_sym(self):
        """True-triangle kernel (contract_pallas_tri): all three plane
        modes match contract_pallas_sym at f32 roundoff for even and odd
        tile counts (the tri schedule has no 0.5-weight wrapped band and
        accumulates the transpose contributions in a resident [8,A]
        block instead of the per-band scratch + roll fold)."""
        from mpmcxx_tpu.ops import pallas_polar
        rng = np.random.default_rng(7)
        l = 2.1304

        for A in (256, 640):   # nr even (2) and odd (5) at b=128
            def antisym(mat):
                return jnp.asarray((mat - mat.T) / 2, jnp.float32)
            dx = antisym(rng.normal(size=(A, A)) * 6)
            dy = antisym(rng.normal(size=(A, A)) * 6)
            dz = antisym(rng.normal(size=(A, A)) * 6)
            co = jnp.asarray(-np.abs(rng.normal(size=(A, A))) * 0.01,
                             jnp.float32)
            co = (co + co.T) / 2
            cd = jnp.asarray(rng.normal(size=(A, A)) * 0.02, jnp.float32)
            cd = (cd + cd.T) / 2
            mu = jnp.asarray(rng.normal(size=(A, 3)) * 0.1)
            w = jnp.sqrt(-co)
            for coeffs in ((dx, dy, dz),                      # mode 3
                           (cd, w * dx, w * dy, w * dz),      # mode 4
                           (co, cd, dx, dy, dz)):             # mode 5
                got = pallas_polar.contract_pallas_tri(
                    coeffs, mu, l=l, interpret=True)
                want = pallas_polar.contract_pallas_sym(
                    coeffs, mu, l=l, interpret=True)
                np.testing.assert_allclose(np.asarray(got),
                                           np.asarray(want),
                                           rtol=2e-5, atol=1e-5)


class TestColumnWriteKernel:
    def test_column_window_write_matches_dus(self):
        """In-place S-column window write: bit-identical to the S separate
        [A,1] dynamic_update_slice ops it replaces, at every window
        placement class (interior, 128-lane tile straddle, array tail)."""
        from mpmcxx_tpu.ops import pallas_polar
        rng = np.random.default_rng(7)
        A = 512
        for S in (1, 3):       # S=1 is the monatomic commit path
            assert pallas_polar.col_write_supported(A, S)
            plane = jnp.asarray(rng.normal(size=(A, A)), jnp.float32)
            cols = jnp.asarray(rng.normal(size=(A, S)), jnp.float32)
            for start in (0, 17, 126, 127, 128, 255, 383, A - S):
                got = pallas_polar.write_columns_pallas(
                    plane, cols, jnp.asarray(start, jnp.int32),
                    interpret=True)
                want = plane
                for s in range(S):
                    want = jax.lax.dynamic_update_slice(
                        want, cols[:, s:s + 1],
                        (jnp.zeros((), jnp.int32), jnp.asarray(start + s,
                                                               jnp.int32)))
                np.testing.assert_array_equal(np.asarray(got),
                                              np.asarray(want))
