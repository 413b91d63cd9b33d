// Oracle dump harness: runs the reference CCJ fold (linked against the
// reference's compiled objects in .ref_build/) and dumps every internal DP
// matrix plus the scaled energy-parameter tables, so the TPU-native
// implementation can be validated cell-by-cell.
//
// This TU only *reads* the reference headers (mounted read-only); the
// `private->public` define gives test access to internal members without
// modifying the reference. Output: <prefix>.json manifest + raw binary blobs.
//
// Usage: dump_oracle <seq> <dangles> <paramfile|DNA|DEFAULT> <noGU:0|1> <prefix>

#define private public
#define protected public
#include "W_final.hh"
#undef private
#undef protected
#include "h_globals.hh"

#include <cstdio>
#include <cstdint>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

static std::ofstream manifest;
static bool first_entry = true;

template <typename T>
static void dump_blob(const std::string &prefix, const std::string &name,
                      const T *data, size_t count, const char *dtype,
                      const std::string &shape) {
  std::string fname = prefix + "." + name + ".bin";
  std::ofstream f(fname, std::ios::binary);
  f.write(reinterpret_cast<const char *>(data), count * sizeof(T));
  f.close();
  if (!first_entry) manifest << ",\n";
  first_entry = false;
  manifest << "  \"" << name << "\": {\"file\": \"" << fname
           << "\", \"dtype\": \"" << dtype << "\", \"shape\": " << shape << "}";
}

static void dump_scalar(const std::string &name, double v) {
  if (!first_entry) manifest << ",\n";
  first_entry = false;
  manifest << "  \"" << name << "\": " << v;
}

static void dump_string(const std::string &name, const std::string &v) {
  if (!first_entry) manifest << ",\n";
  first_entry = false;
  manifest << "  \"" << name << "\": \"" << v << "\"";
}

static std::string shp(std::initializer_list<long> dims) {
  std::string s = "[";
  bool f = true;
  for (long d : dims) {
    if (!f) s += ", ";
    f = false;
    s += std::to_string(d);
  }
  return s + "]";
}

int main(int argc, char **argv) {
  if (argc < 6) {
    fprintf(stderr, "usage: %s seq dangles paramfile|DNA|DEFAULT noGU prefix\n", argv[0]);
    return 1;
  }
  std::string seq = argv[1];
  int dangles = atoi(argv[2]);
  std::string paramfile = argv[3];
  noGU = atoi(argv[4]);
  std::string prefix = argv[5];

  if (paramfile == "DNA") {
    noGU = 1;
    vrna_params_load_DNA_Mathews2004();
  } else if (paramfile != "DEFAULT") {
    if (!vrna_params_load(paramfile.c_str(), VRNA_PARAMETER_FORMAT_DEFAULT)) {
      fprintf(stderr, "failed to load %s\n", paramfile.c_str());
      return 1;
    }
  }

  W_final fold(seq, dangles);
  double energy = fold.ccj();
  int n = (int)seq.length();

  manifest.open(prefix + ".json");
  manifest << "{\n";
  dump_scalar("n", n);
  dump_string("seq", seq);
  dump_scalar("dangles", dangles);
  dump_scalar("noGU", noGU);
  dump_string("structure", fold.structure);
  dump_scalar("energy", energy);

  // sequence encodings & pair matrix
  {
    std::vector<int16_t> S(fold.S_, fold.S_ + n + 2);
    std::vector<int16_t> S1(fold.S1_, fold.S1_ + n + 2);
    dump_blob(prefix, "S", S.data(), S.size(), "<i2", shp({n + 2}));
    dump_blob(prefix, "S1", S1.data(), S1.size(), "<i2", shp({n + 2}));
    std::vector<int32_t> pm(8 * 8);
    for (int a = 0; a < 8; ++a)
      for (int b = 0; b < 8; ++b) pm[a * 8 + b] = pair[a][b];
    dump_blob(prefix, "pair", pm.data(), pm.size(), "<i4", shp({8, 8}));
    std::vector<int32_t> rt(rtype, rtype + 8);
    dump_blob(prefix, "rtype", rt.data(), 8, "<i4", shp({8}));
  }

  // scaled parameter tables (vrna_param_t)
  {
    vrna_param_t *P = fold.params_;
    dump_blob(prefix, "p_stack", &P->stack[0][0], 8 * 8, "<i4", shp({8, 8}));
    dump_blob(prefix, "p_hairpin", P->hairpin, 31, "<i4", shp({31}));
    dump_blob(prefix, "p_bulge", P->bulge, 31, "<i4", shp({31}));
    dump_blob(prefix, "p_internal", P->internal_loop, 31, "<i4", shp({31}));
    dump_blob(prefix, "p_mismatchExt", &P->mismatchExt[0][0][0], 8 * 5 * 5, "<i4", shp({8, 5, 5}));
    dump_blob(prefix, "p_mismatchI", &P->mismatchI[0][0][0], 8 * 5 * 5, "<i4", shp({8, 5, 5}));
    dump_blob(prefix, "p_mismatch1nI", &P->mismatch1nI[0][0][0], 8 * 5 * 5, "<i4", shp({8, 5, 5}));
    dump_blob(prefix, "p_mismatch23I", &P->mismatch23I[0][0][0], 8 * 5 * 5, "<i4", shp({8, 5, 5}));
    dump_blob(prefix, "p_mismatchH", &P->mismatchH[0][0][0], 8 * 5 * 5, "<i4", shp({8, 5, 5}));
    dump_blob(prefix, "p_mismatchM", &P->mismatchM[0][0][0], 8 * 5 * 5, "<i4", shp({8, 5, 5}));
    dump_blob(prefix, "p_dangle5", &P->dangle5[0][0], 8 * 5, "<i4", shp({8, 5}));
    dump_blob(prefix, "p_dangle3", &P->dangle3[0][0], 8 * 5, "<i4", shp({8, 5}));
    dump_blob(prefix, "p_int11", &P->int11[0][0][0][0], 8 * 8 * 5 * 5, "<i4", shp({8, 8, 5, 5}));
    dump_blob(prefix, "p_int21", &P->int21[0][0][0][0][0], 8 * 8 * 5 * 5 * 5, "<i4", shp({8, 8, 5, 5, 5}));
    dump_blob(prefix, "p_int22", &P->int22[0][0][0][0][0][0], 8 * 8 * 5 * 5 * 5 * 5, "<i4", shp({8, 8, 5, 5, 5, 5}));
    dump_blob(prefix, "p_ninio", P->ninio, 5, "<i4", shp({5}));
    dump_scalar("p_lxc", P->lxc);
    dump_scalar("p_MLbase", P->MLbase);
    dump_blob(prefix, "p_MLintern", P->MLintern, 8, "<i4", shp({8}));
    dump_scalar("p_MLclosing", P->MLclosing);
    dump_scalar("p_TerminalAU", P->TerminalAU);
    dump_blob(prefix, "p_Tetraloop_E", P->Tetraloop_E, 200, "<i4", shp({200}));
    dump_string("p_Tetraloops", P->Tetraloops);
    dump_blob(prefix, "p_Triloop_E", P->Triloop_E, 40, "<i4", shp({40}));
    dump_string("p_Triloops", P->Triloops);
    dump_blob(prefix, "p_Hexaloop_E", P->Hexaloop_E, 40, "<i4", shp({40}));
    dump_string("p_Hexaloops", P->Hexaloops);
    dump_scalar("p_temperature", P->temperature);
    dump_scalar("p_special_hp", P->model_details.special_hp);
  }

  int N = n + 1;
  // 2-D triangle matrices, expanded dense [n+1][n+1]; i>j cells = sentinel 0
  auto dump_tri = [&](const char *name, TriangleMatrix &M) {
    std::vector<int32_t> d((size_t)N * N, 0);
    for (int i = 1; i <= n; ++i)
      for (int j = i; j <= n; ++j) d[(size_t)i * N + j] = M.get_uc(i, j);
    dump_blob(prefix, name, d.data(), d.size(), "<i4", shp({N, N}));
  };

  // V energies and types
  {
    std::vector<int32_t> v((size_t)N * N, 0);
    std::vector<int8_t> t((size_t)N * N, 0);
    for (int i = 1; i <= n; ++i)
      for (int j = i; j <= n; ++j) {
        free_energy_node *nd = fold.V->get_node(i, j);
        v[(size_t)i * N + j] = nd->energy;
        t[(size_t)i * N + j] = nd->type;
      }
    dump_blob(prefix, "V", v.data(), v.size(), "<i4", shp({N, N}));
    dump_blob(prefix, "Vtype", t.data(), t.size(), "<i1", shp({N, N}));
  }
  dump_tri("WM", fold.V->WM);
  dump_tri("WMv", fold.V->WMv);
  dump_tri("WMp", fold.V->WMp);
  dump_tri("P2", fold.P->P);
  dump_tri("WBP", fold.P->WBP);
  dump_tri("WPP", fold.P->WPP);
  {
    std::vector<int32_t> w(fold.W.begin(), fold.W.end());
    dump_blob(prefix, "W", w.data(), w.size(), "<i4", shp({(long)w.size()}));
  }

  // 4-D matrices: raw int16 simplex-packed buffers (index replicated in python)
  auto dump4 = [&](const char *name, Matrix4D &M) {
    dump_blob(prefix, name, M.m_.data(), M.m_.size(), "<i2",
              shp({(long)M.m_.size()}));
  };
  pseudo_loop *PL = fold.P;
  dump4("PK", PL->PK);
  dump4("PL", PL->PL);
  dump4("PR", PL->PR);
  dump4("PM", PL->PM);
  dump4("PO", PL->PO);
  dump4("PfromL", PL->PfromL);
  dump4("PfromR", PL->PfromR);
  dump4("PfromM", PL->PfromM);
  dump4("PfromMprime", PL->PfromMprime);
  dump4("PfromO", PL->PfromO);
  dump4("PLmloop00", PL->PLmloop00);
  dump4("PLmloop01", PL->PLmloop01);
  dump4("PLmloop10", PL->PLmloop10);
  dump4("PRmloop00", PL->PRmloop00);
  dump4("PRmloop01", PL->PRmloop01);
  dump4("PRmloop10", PL->PRmloop10);
  dump4("PMmloop00", PL->PMmloop00);
  dump4("PMmloop01", PL->PMmloop01);
  dump4("PMmloop10", PL->PMmloop10);
  dump4("POmloop00", PL->POmloop00);
  dump4("POmloop01", PL->POmloop01);
  dump4("POmloop10", PL->POmloop10);

  manifest << "\n}\n";
  manifest.close();
  printf("%s\n%s (%.2f)\n", seq.c_str(), fold.structure.c_str(), energy);
  return 0;
}
