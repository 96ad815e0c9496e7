"""Boltzmann acceptance factors per ensemble.

Pure-function form of System::boltzmann_factor
(src/System.MonteCarlo.cpp:1345-1470).  All quantities are evaluated on the
post-move state, matching the reference (observables->N is updated by
energy() before the factor is computed).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as const


def uvt_factor(movetype, delta_energy, temperature, volume, fugacity,
               N_after, sorbate_count, biased_move, cavity_volume,
               cavity_bias_probability, partfunc_ratio):
    """(src/System.MonteCarlo.cpp:1358-1422)"""
    T = temperature
    boltz = jnp.exp(-delta_energy / T)

    # unbiased factors
    f_ins = (volume * fugacity * const.ATM2REDUCED / (T * N_after) * boltz *
             sorbate_count)
    f_rem = (T * (N_after + 1.0) / (volume * fugacity * const.ATM2REDUCED) *
             boltz / sorbate_count)
    # cavity-biased variants (src/System.MonteCarlo.cpp:1370-1388)
    cb_ins = (cavity_volume * cavity_bias_probability * fugacity *
              const.ATM2REDUCED / (T * N_after)) * boltz * sorbate_count
    cb_rem = (T * (N_after + 1.0) /
              (cavity_volume * cavity_bias_probability * fugacity *
               const.ATM2REDUCED)) * boltz / sorbate_count

    ins = jnp.where(biased_move, cb_ins, f_ins)
    rem = jnp.where(biased_move, cb_rem, f_rem)

    return jnp.select(
        [movetype == const.MOVETYPE_INSERT,
         movetype == const.MOVETYPE_REMOVE,
         movetype == const.MOVETYPE_SPINFLIP],
        [ins, rem, partfunc_ratio],
        boltz)


def nvt_factor(movetype, delta_energy, temperature, partfunc_ratio):
    return jnp.where(movetype == const.MOVETYPE_SPINFLIP, partfunc_ratio,
                     jnp.exp(-delta_energy / temperature))


def npt_factor(movetype, delta_energy, temperature, pressure,
               v_old, v_new, N_after):
    vol = jnp.exp(-(delta_energy
                    + pressure * const.ATM2REDUCED * (v_new - v_old)
                    - (N_after + 1) * temperature * jnp.log(v_new / v_old))
                  / temperature)
    return jnp.where(movetype == const.MOVETYPE_VOLUME, vol,
                     jnp.exp(-delta_energy / temperature))


def nve_factor(total_energy, initial_energy, final_energy, N):
    """Microcanonical (E_tot - E)^{3N/2} weight ratio
    (src/System.MonteCarlo.cpp:1459-1462), evaluated in log space: the
    reference's direct pow overflows the TPU's emulated-f64 exponent
    range (~1e+-38) once 1.5*N exceeds a handful, turning every step
    into inf/inf -> NaN -> reject on-chip.

    C pow sign semantics are preserved (a reference quirk): with
    E > E_tot and 3N/2 integral, pow(negative, int) is signed and the
    num/den signs cancel, so the reference chain keeps moving in the
    "forbidden" region; with 3N/2 non-integral, pow(negative) is NaN
    and the step rejects.  Only E_old == E_tot exactly (reference:
    division by pow(0) -> inf) deviates, to a reject."""
    num = total_energy - final_energy
    den = total_energy - initial_energy
    p = 1.5 * N
    is_int = p == jnp.floor(p)
    odd = (jnp.floor(p) % 2.0) == 1.0

    def _sign_valid(base):
        sign = jnp.where((base < 0.0) & odd, -1.0, 1.0)
        valid = (base > 0.0) | ((base < 0.0) & is_int)
        return sign, valid

    s_num, v_num = _sign_valid(num)
    s_den, v_den = _sign_valid(den)
    valid = v_num & v_den
    log_ratio = (jnp.log(jnp.abs(jnp.where(valid, num, 1.0)))
                 - jnp.log(jnp.abs(jnp.where(valid, den, 1.0))))
    return jnp.where(valid, s_num * s_den * jnp.exp(p * log_ratio), 0.0)


def spin_partfunc_ratio(nuclear_spin_after, g, u):
    """Ratio of rotational partition functions for the flipped state
    (src/System.MonteCarlo.cpp:1407-1415)."""
    return jnp.where(nuclear_spin_after == const.NUCLEAR_SPIN_PARA,
                     g / (g + u), u / (g + u))
