// Dump the reference's built-in (default.c) raw parameter globals — free
// energies at 37C plus enthalpies — into a JSON file that seeds the TPU
// framework's base parameter state.  ``.par`` files only overlay a subset of
// entries (e.g. pair-type 0 rows, int22 NN blocks are never written), so the
// exact defaults are required for bit parity.
//
// Usage: dump_raw_defaults [DNA] <out.json>

#include <cstdio>
#include <cstring>
#include <string>
extern "C" {
#include "ViennaRNA/params/default.h"
#include "ViennaRNA/params/io.h"
}

static FILE *out;
static bool first = true;

static void key(const char *name) {
  if (!first) fprintf(out, ",\n");
  first = false;
  fprintf(out, "  \"%s\": ", name);
}

static void arr(const char *name, const int *p, size_t count) {
  key(name);
  fprintf(out, "[");
  for (size_t i = 0; i < count; ++i)
    fprintf(out, "%s%d", i ? "," : "", p[i]);
  fprintf(out, "]");
}

static void scal(const char *name, double v) {
  key(name);
  fprintf(out, "%g", v);
}

static void str(const char *name, const char *v) {
  key(name);
  fprintf(out, "\"%s\"", v);
}

int main(int argc, char **argv) {
  const char *fname = argv[1];
  if (argc > 2 && strcmp(argv[1], "DNA") == 0) {
    vrna_params_load_DNA_Mathews2004();
    fname = argv[2];
  }
  out = fopen(fname, "w");
  fprintf(out, "{\n");
  scal("lxc37", lxc37);
  arr("stack37", &stack37[0][0], 8 * 8);
  arr("stackdH", &stackdH[0][0], 8 * 8);
  arr("hairpin37", hairpin37, 31);
  arr("hairpindH", hairpindH, 31);
  arr("bulge37", bulge37, 31);
  arr("bulgedH", bulgedH, 31);
  arr("internal_loop37", internal_loop37, 31);
  arr("internal_loopdH", internal_loopdH, 31);
  arr("mismatchI37", &mismatchI37[0][0][0], 8 * 5 * 5);
  arr("mismatchIdH", &mismatchIdH[0][0][0], 8 * 5 * 5);
  arr("mismatch1nI37", &mismatch1nI37[0][0][0], 8 * 5 * 5);
  arr("mismatch1nIdH", &mismatch1nIdH[0][0][0], 8 * 5 * 5);
  arr("mismatch23I37", &mismatch23I37[0][0][0], 8 * 5 * 5);
  arr("mismatch23IdH", &mismatch23IdH[0][0][0], 8 * 5 * 5);
  arr("mismatchH37", &mismatchH37[0][0][0], 8 * 5 * 5);
  arr("mismatchHdH", &mismatchHdH[0][0][0], 8 * 5 * 5);
  arr("mismatchM37", &mismatchM37[0][0][0], 8 * 5 * 5);
  arr("mismatchMdH", &mismatchMdH[0][0][0], 8 * 5 * 5);
  arr("mismatchExt37", &mismatchExt37[0][0][0], 8 * 5 * 5);
  arr("mismatchExtdH", &mismatchExtdH[0][0][0], 8 * 5 * 5);
  arr("dangle5_37", &dangle5_37[0][0], 8 * 5);
  arr("dangle5_dH", &dangle5_dH[0][0], 8 * 5);
  arr("dangle3_37", &dangle3_37[0][0], 8 * 5);
  arr("dangle3_dH", &dangle3_dH[0][0], 8 * 5);
  arr("int11_37", &int11_37[0][0][0][0], 8 * 8 * 5 * 5);
  arr("int11_dH", &int11_dH[0][0][0][0], 8 * 8 * 5 * 5);
  arr("int21_37", &int21_37[0][0][0][0][0], 8 * 8 * 5 * 5 * 5);
  arr("int21_dH", &int21_dH[0][0][0][0][0], 8 * 8 * 5 * 5 * 5);
  arr("int22_37", &int22_37[0][0][0][0][0][0], 8 * 8 * 5 * 5 * 5 * 5);
  arr("int22_dH", &int22_dH[0][0][0][0][0][0], 8 * 8 * 5 * 5 * 5 * 5);
  scal("ML_BASE37", ML_BASE37);
  scal("ML_BASEdH", ML_BASEdH);
  scal("ML_closing37", ML_closing37);
  scal("ML_closingdH", ML_closingdH);
  scal("ML_intern37", ML_intern37);
  scal("ML_interndH", ML_interndH);
  scal("ninio37", ninio37);
  scal("niniodH", niniodH);
  scal("MAX_NINIO", MAX_NINIO);
  scal("DuplexInit37", DuplexInit37);
  scal("DuplexInitdH", DuplexInitdH);
  scal("TerminalAU37", TerminalAU37);
  scal("TerminalAUdH", TerminalAUdH);
  str("Tetraloops", Tetraloops);
  arr("Tetraloop37", Tetraloop37, 40);
  arr("TetraloopdH", TetraloopdH, 40);
  str("Triloops", Triloops);
  arr("Triloop37", Triloop37, 40);
  arr("TriloopdH", TriloopdH, 40);
  str("Hexaloops", Hexaloops);
  arr("Hexaloop37", Hexaloop37, 40);
  arr("HexaloopdH", HexaloopdH, 40);
  fprintf(out, "\n}\n");
  fclose(out);
  return 0;
}
