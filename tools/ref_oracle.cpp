// Single-point energy oracle for golden-fixture generation.
//
// The non-MPI reference *binary* can only reach energy() through the
// pi_nvt identical-beads trick, which hides three_body_energy and
// refuses Feynman-Hibbs (PI aggregation gathers only rd/es/polar/vdw,
// src/SimulationControl.PathIntegral.cpp:752-800).  This driver links
// against the reference build's own object files, runs its standard
// initialization (parse -> validate -> setup box -> pairs), calls
// System::energy() once, and dumps the full observables breakdown as
// JSON.  Build/usage: tools/make_golden.py (oracle-only; never shipped).
#include <cstdio>
#include <cstdlib>

#include "SimulationControl.h"

// globals normally defined by the reference's main.cpp (excluded here)
int rank = 0;
int size = 0;
bool mpi = false;

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: ref_oracle <input.in>\n");
        return 2;
    }
    SimulationControl sc(argv[1], 0, false, nullptr);
    sc.initializeSimulationObjects();
    try {
        sc.sys.energy();
    } catch (int e) {
        // polarizability_tensor mode prints its report from inside
        // polar() and throws exception_ok (=100) to end the run
        // (src/System.Energy.cpp:2601-2605, constants.h:108)
        fflush(stdout);
        return e == 100 ? 0 : e;
    }
    System::observables_t *o = sc.sys.observables;
    printf("{\"energy\": %.10f, \"rd\": %.10f, \"coulombic\": %.10f, "
           "\"polar\": %.10f, \"vdw\": %.10f, \"three_body\": %.10f, "
           "\"kinetic\": %.10f}\n",
           o->energy, o->rd_energy, o->coulombic_energy,
           o->polarization_energy, o->vdw_energy, o->three_body_energy,
           o->kinetic_energy);
    return 0;
}
