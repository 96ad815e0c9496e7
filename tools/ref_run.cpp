// Full-run oracle driver: run ANY reference ensemble non-MPI.
//
// The shipped main leaves the global `size` at 0 in non-MPI builds
// (parallel_introspection_and_initialization, src/args_etc.h:153-186),
// which makes setup_mpi_dataStructs attempt a 0-byte calloc and abort
// (src/System.MonteCarlo.cpp:245) for every standard ensemble.  Setting
// size=1 (what an `mpirun -np 1` run would see) restores the serial
// fallback paths the code already contains — memcpy instead of
// MPI_Gather (src/System.MonteCarlo.cpp:1976-1979) — so nvt/uvt/npt/nve
// and Gibbs run to completion and write their normal outputs.
// Build/usage: tools/make_golden.py build_oracle2() / verify tooling.
#include <cstdio>
#include <cstdlib>

// oracle-only access hack: reach the private systems vector so the
// per-system serial-fallback fix below can be applied to Gibbs/PI copies
#define private public
#include "SimulationControl.h"
#undef private

int rank = 0;
int size = 1;   // the fix: pretend to be mpirun -np 1
bool mpi = false;

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: ref_run <input.in>\n");
        return 2;
    }
    try {
        SimulationControl sc(argv[1], 0, false, nullptr);
        sc.initializeSimulationObjects();
        // second latent serial bug: do_corrtime_bookkeeping's non-MPI
        // branch writes through the never-initialized MEMBER mpi_data
        // (src/System.MonteCarlo.cpp:1978 `mpi_data.temperature[0]`, vs
        // the local MPI_Data set up at :181) -> null deref.  Initialize
        // the member too so the serial fallback path works.
        sc.sys.setup_mpi_dataStructs(1);
        for (System *s : sc.systems)
            s->setup_mpi_dataStructs(1);
        // Gibbs latent bug #3: backup_observables_ALL_SYSTEMS
        // dereferences the TEMPLATE system's checkpoint->observables
        // (SimulationControl.cpp:2839-2841), but only the two copies go
        // through allocateStatisticsMem in initialize_Gibbs_systems —
        // the template never does.  Allocate it so Gibbs can run.
        if (!sc.sys.checkpoint)
            sc.sys.allocateStatisticsMem();
        sc.runSimulation();
    } catch (int e) {
        fflush(stdout);
        return e == 100 ? 0 : e;
    }
    return 0;
}
