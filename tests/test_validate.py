"""Table-driven check of the full option-validation error surface.

One row per error condition of the reference's check_system /
check_mc_options / check_spectre_options / check_feynman_hibbs_options /
check_simulated_annealing_options / check_polarization_options /
check_qrot_options / check_PI_options passes
(src/SimulationControl.cpp:1617-2850,
src/SimulationControl.PathIntegral.cpp:552-606,
src/SimulationControl.Gibbs.cpp:93-129): a migrating user feeding the
same bad input gets the same error message (minus the "SIM_CONTROL: "
log prefix).  Soft defaults (histogram resolution, FH order, filenames)
are asserted separately.
"""

import warnings

import pytest

from mpmcxx_tpu import constants as const
from mpmcxx_tpu.config.parser import ConfigError, parse_config
from mpmcxx_tpu.config.validate import validate

BASE = ("ensemble nvt\njob_name jj\ntemperature 100\n"
        "numsteps 10\ncorrtime 5\n")
UVT = ("ensemble uvt\njob_name jj\ntemperature 100\n"
       "numsteps 10\ncorrtime 5\npressure 1.0\n")
POLAR = BASE + ("polarization on\npolar_iterative on\npolar_max_iter 4\n"
                "polar_damp_type exponential\npolar_damp 2.1304\n")

# (extra input lines, base, expected-message regex, reference anchor)
ERROR_TABLE = [
    # check_mc_options (SimulationControl.cpp:1797-2171)
    ("", "ensemble nvt\ntemperature 100\ncorrtime 5\n",
     "Improper number of steps", "1812"),
    ("", "ensemble nvt\ntemperature 100\nnumsteps 10\n",
     "Improper correlation time", "1822"),
    ("", "ensemble nvt\nnumsteps 10\ncorrtime 5\n",
     "Invalid temperature", "1841"),
    ("spinflip_probability 1.5\n", BASE,
     "spinflip probabilities is greater than 1.0", "1925"),
    ("feynman_hibbs on\n",
     BASE.replace("ensemble nvt", "ensemble pi_nvt"),
     "Feynmann hibbs approximation cannot be used with a Path Integral",
     "1942"),
    ("spinflip_probability 0.6\nbead_perturb_probability 0.6\n",
     BASE.replace("ensemble nvt", "ensemble pi_nvt"),
     "probabilities for all MC moves sum to a value greater than 1.0",
     "1947"),
    ("", BASE.replace("ensemble nvt", "ensemble npt"),
     "invalid pressure set for NPT", "1963"),
    ("user_fugacities 2.0\npressure 1.0\n",
     BASE.replace("ensemble nvt", "ensemble uvt"),
     "not compatible with pressure specification", "2007"),
    ("", BASE.replace("ensemble nvt", "ensemble uvt"),
     "invalid pressure set for GCMC", "2015"),
    ("h2_fugacity on\nco2_fugacity on\n", UVT,
     "fugacity called, but fugacities are already set", "2027-2075"),
    ("cavity_autoreject on\n", BASE,
     "cavity_autoreject_scale either not set or out of range", "2142"),
    ("cavity_autoreject_absolute on\ncavity_autoreject_scale 1.5\n", BASE,
     "cavity_autoreject_scale either not set or out of range", "2151"),
    ("cavity_bias on\ncavity_grid 0\ncavity_radius 2.0\n", BASE,
     "invalid cavity grid or radius", "2160"),
    # check_system inline (1617-1792)
    ("rd_crystal on\nrd_crystal_order 0\n", BASE,
     "rd crystal order must be positive", "1690"),
    ("waldmanhagler on\nhalgren_mixing on\n", BASE,
     "more than one mixing rule specified", "1711"),
    ("rd_anharmonic on\n", BASE,
     "rd_anharmonic being set requires rd_only", "1781"),
    # check_spectre_options (2176-2191)
    ("spectre on\nspectre_max_charge 1\nspectre_max_target 1\n",
     BASE.replace("ensemble nvt", "ensemble npt")
         .replace("temperature 100", "temperature 100\npressure 1"),
     "SPECTRE algorithm requires canonical ensemble", "2179"),
    # check_feynman_hibbs_options (2473-2515)
    ("feynman_hibbs on\nfeynman_kleinert on\n", BASE,
     "Feynman-Kleinert iteration only implemented for anharmonic",
     "2483"),
    ("feynman_hibbs on\npolarvdw on\n", POLAR,
     "cavity_autoreject_absolute must be used with polarvdw", "2505"),
    # check_simulated_annealing_options (2520-2547)
    ("simulated_annealing on\nsimulated_annealing_schedule 1.5\n", BASE,
     "invalid simulated annealing temperature schedule", "2526"),
    ("simulated_annealing on\nsimulated_annealing_schedule 0.9\n"
     "simulated_annealing_target -3\n", BASE,
     "invalid simulated annealing target", "2534"),
    # check_polarization_options (2606-2785)
    ("polarization on\npolarizability_tensor on\npolar_iterative on\n"
     "polar_max_iter 4\npolar_damp_type exponential\npolar_damp 2.13\n",
     BASE, "iterative polarizability tensor method not implemented",
     "2630"),
    ("polarization on\npolar_zodid on\npolar_damp_type exponential\n"
     "polar_damp 2.13\n", BASE,
     "ZODID and matrix inversion cannot both be set", "2635"),
    ("polar_wolf on\npolar_wolf_alpha_lookup on\n"
     "polar_wolf_alpha_lookup_cutoff -1\n", POLAR,
     "invalid polar_wolf_alpha_lookup_cutoff", "2646"),
    ("polar_wolf on\npolar_wolf_alpha 1.5\n", POLAR,
     "polar_wolf_alpha >= 0 is required", "2658"),
    ("polarization on\npolar_iterative on\npolar_max_iter 4\n", BASE,
     "damping factor must be specified", "2681"),
    ("polar_precision 0.001\n", POLAR,
     "cannot specify both polar_precision and polar_max_iter", "2696"),
    ("polar_sor on\npolar_esor on\n", POLAR,
     "cannot specify both SOR and ESOR SCF methods", "2715"),
    ("polar_gamma -0.5\n", POLAR,
     "invalid Pre-cond/SOR/ESOR gamma set", "2725"),
    ("polar_gs on\npolar_gs_ranked on\n", POLAR,
     "both polar_gs and polar_gs_ranked cannot be set", "2733"),
    ("polarvdw on\ncdvdw_exp_repulsion on\ncdvdw_sig_repulsion on\n",
     POLAR, "more than one mixing rules specified", "2769"),
    ("cdvdw_exp_repulsion on\n", POLAR,
     "exponential repulsion must be used in conjunction with polarvdw",
     "2775"),
    ("cdvdw_sig_repulsion on\n", POLAR,
     "sig repulsion is used in conjunction with polarvdw", "2779"),
    # check_qrot_options (2790-2850)
    ("quantum_rotation on\n", BASE,
     "invalid quantum rotational constant B", "2796"),
    ("quantum_rotation on\nquantum_rotation_B 85.3\n", BASE,
     "invalid quantum rotation level max", "2804"),
    ("quantum_rotation on\nquantum_rotation_B 85.3\n"
     "quantum_rotation_level_max 36\n", BASE,
     "invalid quantum rotation l_max", "2812"),
    ("quantum_rotation on\nquantum_rotation_B 85.3\n"
     "quantum_rotation_level_max 37\nquantum_rotation_l_max 5\n", BASE,
     "levels cannot exceed l_max", "2820"),
    ("quantum_rotation on\nquantum_rotation_B 85.3\n"
     "quantum_rotation_level_max 36\nquantum_rotation_l_max 5\n"
     "quantum_rotation_sum 37\n", BASE,
     "quantum rotational sum for partition function invalid", "2826"),
    # Gibbs (SimulationControl.Gibbs.cpp:112-115)
    ("", BASE.replace("ensemble nvt", "ensemble nvt_gibbs"),
     "transfer move probability was either not set", "Gibbs.cpp:113"),
]


@pytest.mark.parametrize(
    "extra,base,msg", [(e, b, m) for e, b, m, _ in ERROR_TABLE],
    ids=[f"{m[:40]}@{anchor}" for _, _, m, anchor in ERROR_TABLE])
def test_reference_rejected_inputs(extra, base, msg):
    cfg = parse_config(base + extra)
    with pytest.raises(ConfigError, match=msg):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            validate(cfg)


class TestPIChecks:
    # check_PI_options (SimulationControl.PathIntegral.cpp:552-606)
    def test_trotter_power_of_two(self):
        cfg = parse_config(BASE.replace("ensemble nvt", "ensemble pi_nvt")
                           + "PI_trial_chain_length 2\n")
        with pytest.raises(ConfigError, match="power of 2"):
            validate(cfg, n_systems=6)

    def test_trial_chain_required_and_bounded(self):
        cfg = parse_config(BASE.replace("ensemble nvt", "ensemble pi_nvt"))
        with pytest.raises(ConfigError, match="PI_trial_chain_length"):
            validate(cfg, n_systems=4)
        cfg = parse_config(BASE.replace("ensemble nvt", "ensemble pi_nvt")
                           + "PI_trial_chain_length 4\n")
        with pytest.raises(ConfigError, match=r"\[1\.\.P-1\]"):
            validate(cfg, n_systems=4)


class TestSoftDefaults:
    def test_fh_order_defaults_to_2(self):
        # SimulationControl.cpp:2497-2500
        cfg = parse_config(BASE + "feynman_hibbs on\n"
                                  "feynman_hibbs_order 3\n")
        validate(cfg)
        assert cfg.feynman_hibbs_order == 2

    def test_hist_defaults(self):
        # check_hist_options soft clamps (SimulationControl.cpp:2552-2601)
        cfg = parse_config(BASE + "pop_histogram on\npop_hist_resolution 7.0\n")
        validate(cfg)
        assert cfg.hist_resolution == 0.7
        assert cfg.max_bondlength == 1.8
        assert cfg.frozen_output == "frozen.dx"

    def test_gwp_probability_inherits_move_factor(self):
        # SimulationControl.cpp:1759-1762
        cfg = parse_config(BASE + "gwp on\nmove_factor 0.25\n")
        validate(cfg)
        assert cfg.gwp_probability == 0.25

    def test_uvt_eos_assigns_fugacity(self):
        cfg = parse_config(UVT + "co2_fugacity on\n")
        validate(cfg)
        assert len(cfg.fugacities) == 1 and cfg.fugacities[0] > 0

    def test_gibbs_warns_but_accepts_oversummed_probabilities(self):
        # Gibbs.cpp:126-129 prints the error without aborting
        cfg = parse_config(
            BASE.replace("ensemble nvt", "ensemble nvt_gibbs")
            + "transfer_probability 0.6\nvolume_probability 0.6\n")
        with pytest.warns(UserWarning, match="may not exceed 1.0"):
            validate(cfg)

    def test_gs_fixed_iter_warns_about_iterate_order(self):
        # MIGRATION.md: finite-K GS iterates differ from the reference's
        # sequential sweep (System.Energy.cpp:3564-3597)
        cfg = parse_config(POLAR + "polar_gs on\n")
        with pytest.warns(UserWarning, match="Gauss-Seidel"):
            validate(cfg)
