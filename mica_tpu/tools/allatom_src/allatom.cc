// mica-allatom: rebuild a full-atom protein model from a CA-only trace.
//
// Native (C++) counterpart of the role PULCHRA plays in the reference
// pipeline (modules/pulchra304, invoked as `pulchra <frag>.pdb -c`,
// modeler.py:294-419).  This is an independent implementation, not a port:
//
//   * backbone N/C/O placement from ideal trans-peptide geometry oriented
//     per-residue by the local CA curvature, with a per-peptide rotation
//     search that maximizes hydrogen-bond-like geometry and minimizes
//     clashes (replaces PULCHRA's binned statistical fragment library);
//   * CB from ideal L-amino-acid tetrahedral geometry;
//   * side chains grown by NeRF (natural extension reference frames) from
//     an internal-coordinate table at the most common rotamer
//     (replaces PULCHRA's rotamer library, whose coordinate table is not
//     even present in the reference snapshot);
//   * excluded-volume relaxation on a spatial hash grid;
//   * chain splitting at chain-ID changes and residue-number gaps,
//     matching the fragment semantics of the reference driver.
//
// Usage: mica_allatom <ca_model.pdb> <out.pdb>
//
// Exit 0 on success.

#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vec3 {
  double x = 0, y = 0, z = 0;
  Vec3() = default;
  Vec3(double a, double b, double c) : x(a), y(b), z(c) {}
  Vec3 operator+(const Vec3 &o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3 &o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
};

double dot(const Vec3 &a, const Vec3 &b) {
  return a.x * b.x + a.y * b.y + a.z * b.z;
}
Vec3 cross(const Vec3 &a, const Vec3 &b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
double norm(const Vec3 &a) { return std::sqrt(dot(a, a)); }
Vec3 unit(const Vec3 &a) {
  double n = norm(a);
  return n > 1e-9 ? a * (1.0 / n) : Vec3(1, 0, 0);
}
double dist(const Vec3 &a, const Vec3 &b) { return norm(a - b); }

// NeRF: place D given A-B-C, bond |CD|, angle B-C-D (deg), dihedral A-B-C-D.
Vec3 nerf(const Vec3 &a, const Vec3 &b, const Vec3 &c, double bond,
          double angle_deg, double dihedral_deg) {
  const double ang = angle_deg * M_PI / 180.0;
  const double dih = dihedral_deg * M_PI / 180.0;
  Vec3 bc = unit(c - b);
  Vec3 n = unit(cross(b - a, bc));
  Vec3 m = cross(n, bc);
  double d2 = bond * std::sin(ang);
  Vec3 d = bc * (-bond * std::cos(ang)) + m * (d2 * std::cos(dih)) +
           n * (d2 * std::sin(dih));
  return c + d;
}

struct Atom {
  std::string name;
  Vec3 pos;
  char element;
};

struct Residue {
  std::string res_name;
  char chain;
  int res_id;
  Vec3 ca;
  std::vector<Atom> atoms;  // rebuilt atoms (includes CA)
};

// ---------------------------------------------------------------------------
// side-chain internal coordinates
// entry: atom name, three reference atoms, bond, angle, dihedral
struct IC {
  const char *atom;
  const char *a, *b, *c;  // dihedral(atom, c, b, a); bonded to c
  double bond, angle, dihedral;
};

// Most-common-rotamer internal coordinates, standard bond geometry.
const std::map<std::string, std::vector<IC>> &sidechain_table() {
  static const std::map<std::string, std::vector<IC>> t = {
      {"ALA", {}},
      {"SER", {{"OG", "N", "CA", "CB", 1.417, 110.8, 62}}},
      {"CYS", {{"SG", "N", "CA", "CB", 1.808, 113.8, -65}}},
      {"THR",
       {{"OG1", "N", "CA", "CB", 1.433, 109.6, 62},
        {"CG2", "N", "CA", "CB", 1.521, 110.5, -178}}},
      {"VAL",
       {{"CG1", "N", "CA", "CB", 1.527, 110.5, 175},
        {"CG2", "N", "CA", "CB", 1.527, 110.5, -63}}},
      {"ILE",
       {{"CG1", "N", "CA", "CB", 1.530, 110.4, -65},
        {"CG2", "N", "CA", "CB", 1.521, 110.5, 174},
        {"CD1", "CA", "CB", "CG1", 1.513, 113.8, 170}}},
      {"LEU",
       {{"CG", "N", "CA", "CB", 1.530, 116.3, -65},
        {"CD1", "CA", "CB", "CG", 1.521, 110.7, 175},
        {"CD2", "CA", "CB", "CG", 1.521, 110.7, -65}}},
      {"MET",
       {{"CG", "N", "CA", "CB", 1.520, 114.1, -65},
        {"SD", "CA", "CB", "CG", 1.803, 112.7, 180},
        {"CE", "CB", "CG", "SD", 1.791, 100.9, 75}}},
      {"PRO",
       {{"CG", "N", "CA", "CB", 1.492, 104.5, -28},
        {"CD", "CA", "CB", "CG", 1.503, 106.1, 36}}},
      {"PHE",
       {{"CG", "N", "CA", "CB", 1.502, 113.8, -65},
        {"CD1", "CA", "CB", "CG", 1.384, 120.8, 90},
        {"CD2", "CA", "CB", "CG", 1.384, 120.8, -90},
        {"CE1", "CB", "CG", "CD1", 1.382, 120.8, 180},
        {"CE2", "CB", "CG", "CD2", 1.382, 120.8, 180},
        {"CZ", "CG", "CD1", "CE1", 1.382, 120.0, 0}}},
      {"TYR",
       {{"CG", "N", "CA", "CB", 1.512, 113.9, -65},
        {"CD1", "CA", "CB", "CG", 1.389, 120.8, 90},
        {"CD2", "CA", "CB", "CG", 1.389, 120.8, -90},
        {"CE1", "CB", "CG", "CD1", 1.382, 121.1, 180},
        {"CE2", "CB", "CG", "CD2", 1.382, 121.1, 180},
        {"CZ", "CG", "CD1", "CE1", 1.378, 119.5, 0},
        {"OH", "CD1", "CE1", "CZ", 1.376, 119.9, 180}}},
      {"TRP",
       {{"CG", "N", "CA", "CB", 1.498, 113.6, -65},
        {"CD1", "CA", "CB", "CG", 1.365, 126.9, 95},
        {"CD2", "CA", "CB", "CG", 1.433, 126.7, -85},
        {"NE1", "CB", "CG", "CD1", 1.374, 110.2, 180},
        {"CE2", "CB", "CG", "CD2", 1.409, 107.2, 180},
        {"CE3", "CB", "CG", "CD2", 1.398, 133.9, 0},
        {"CZ2", "CG", "CD2", "CE2", 1.394, 122.4, 180},
        {"CZ3", "CG", "CD2", "CE3", 1.382, 118.6, 180},
        {"CH2", "CD2", "CE2", "CZ2", 1.368, 117.5, 0}}},
      {"ASP",
       {{"CG", "N", "CA", "CB", 1.516, 113.0, -70},
        {"OD1", "CA", "CB", "CG", 1.249, 118.4, -15},
        {"OD2", "CA", "CB", "CG", 1.249, 118.4, 165}}},
      {"ASN",
       {{"CG", "N", "CA", "CB", 1.516, 112.7, -65},
        {"OD1", "CA", "CB", "CG", 1.231, 120.8, -20},
        {"ND2", "CA", "CB", "CG", 1.328, 116.5, 160}}},
      {"GLU",
       {{"CG", "N", "CA", "CB", 1.520, 114.1, -65},
        {"CD", "CA", "CB", "CG", 1.516, 112.6, 180},
        {"OE1", "CB", "CG", "CD", 1.249, 118.4, 0},
        {"OE2", "CB", "CG", "CD", 1.249, 118.4, 180}}},
      {"GLN",
       {{"CG", "N", "CA", "CB", 1.520, 114.1, -65},
        {"CD", "CA", "CB", "CG", 1.516, 112.6, 180},
        {"OE1", "CB", "CG", "CD", 1.231, 120.8, 0},
        {"NE2", "CB", "CG", "CD", 1.328, 116.5, 180}}},
      {"LYS",
       {{"CG", "N", "CA", "CB", 1.520, 114.1, -65},
        {"CD", "CA", "CB", "CG", 1.520, 111.3, 180},
        {"CE", "CB", "CG", "CD", 1.508, 111.3, 180},
        {"NZ", "CG", "CD", "CE", 1.489, 111.5, 180}}},
      {"ARG",
       {{"CG", "N", "CA", "CB", 1.520, 114.1, -65},
        {"CD", "CA", "CB", "CG", 1.520, 111.3, 180},
        {"NE", "CB", "CG", "CD", 1.461, 112.0, 180},
        {"CZ", "CG", "CD", "NE", 1.329, 124.2, 180},
        {"NH1", "CD", "NE", "CZ", 1.326, 120.0, 0},
        {"NH2", "CD", "NE", "CZ", 1.326, 120.0, 180}}},
      {"HIS",
       {{"CG", "N", "CA", "CB", 1.492, 113.8, -65},
        {"ND1", "CA", "CB", "CG", 1.380, 122.7, -70},
        {"CD2", "CA", "CB", "CG", 1.354, 131.1, 110},
        {"CE1", "CB", "CG", "ND1", 1.326, 109.3, 180},
        {"NE2", "CB", "CG", "CD2", 1.373, 107.2, 180}}},
      {"GLY", {}},
  };
  return t;
}

char element_of(const std::string &name) {
  for (char c : name) {
    if (!isdigit(c)) return c == 'H' ? 'H' : c;
  }
  return 'C';
}

// ---------------------------------------------------------------------------
// PDB IO

struct CAChainFragment {
  std::vector<Residue> residues;
};

std::vector<CAChainFragment> read_ca_pdb(const std::string &path) {
  std::ifstream in(path);
  std::vector<CAChainFragment> frags;
  CAChainFragment cur;
  char last_chain = 0;
  int last_rid = -1000000;
  std::string line;
  while (std::getline(in, line)) {
    if (line.compare(0, 4, "ATOM") != 0 || line.size() < 54) continue;
    std::string name = line.substr(12, 4);
    name.erase(0, name.find_first_not_of(' '));
    name.erase(name.find_last_not_of(' ') + 1);
    if (name != "CA") continue;
    Residue r;
    r.res_name = line.substr(17, 3);
    r.chain = line[21];
    r.res_id = std::stoi(line.substr(22, 4));
    r.ca = {std::stod(line.substr(30, 8)), std::stod(line.substr(38, 8)),
            std::stod(line.substr(46, 8))};
    int gap = r.res_id - last_rid;
    if (!cur.residues.empty() && (r.chain != last_chain || (gap != 0 && gap != 1))) {
      frags.push_back(cur);
      cur = CAChainFragment{};
    }
    // also split on physically impossible CA-CA distances
    if (!cur.residues.empty() && dist(cur.residues.back().ca, r.ca) > 4.6) {
      frags.push_back(cur);
      cur = CAChainFragment{};
    }
    last_chain = r.chain;
    last_rid = r.res_id;
    cur.residues.push_back(r);
  }
  if (!cur.residues.empty()) frags.push_back(cur);
  return frags;
}

// ---------------------------------------------------------------------------
// backbone building

// Ideal trans-peptide positions of C(i) and N(i+1) relative to the
// CA(i)->CA(i+1) axis (see derivation in repo docs): with CA(i) at the
// origin and CA(i+1) at (d, 0), both C and N sit slightly off-axis on the
// same side of the peptide plane.
struct PeptideGeom {
  double cx = 1.426, cy = 0.540;   // C(i)
  double nx = 2.394, ny = 0.387;   // N(i+1)
};

// Build backbone for a fragment: for each peptide bond choose the plane
// orientation angle that best continues the chain (scored by O(i)..N(i+3)
// H-bond-like proximity and CA(i-1) avoidance), then place O.
void build_backbone(CAChainFragment &frag) {
  const PeptideGeom g;
  size_t n = frag.residues.size();
  std::vector<Vec3> C(n), N(n), O(n);
  std::vector<bool> hasC(n, false), hasN(n, false);

  for (size_t i = 0; i + 1 < n; ++i) {
    Vec3 ca0 = frag.residues[i].ca;
    Vec3 ca1 = frag.residues[i + 1].ca;
    Vec3 u = unit(ca1 - ca0);
    double d = dist(ca0, ca1);
    // reference perpendicular: local curvature normal
    Vec3 refv;
    if (i > 0) {
      refv = frag.residues[i - 1].ca - ca0;
    } else if (i + 2 < n) {
      refv = frag.residues[i + 2].ca - ca1;
    } else {
      refv = Vec3(0, 0, 1);
    }
    Vec3 p = refv - u * dot(refv, u);
    if (norm(p) < 1e-6) p = cross(u, Vec3(1, 0, 0));
    if (norm(p) < 1e-6) p = cross(u, Vec3(0, 1, 0));
    Vec3 e1 = unit(p);
    Vec3 e2 = unit(cross(u, e1));

    // search the rotation of the peptide plane about the CA-CA axis
    double best_score = -1e18;
    Vec3 bestC, bestN;
    double scale = d / 3.80;  // tolerate non-ideal CA spacing
    for (int k = 0; k < 36; ++k) {
      double th = k * 10.0 * M_PI / 180.0;
      Vec3 dir = e1 * std::cos(th) + e2 * std::sin(th);
      Vec3 pc = ca0 + u * (g.cx * scale) + dir * g.cy;
      Vec3 pn = ca0 + u * (g.nx * scale) + dir * g.ny;
      double score = 0;
      // prefer carbonyl direction anti-parallel to local helix axis:
      // approximate by pointing the plane normal away from CA(i-1) and
      // CA(i+2) (avoids clashes, produces alternating planes on strands)
      if (i > 0) score += dist(pc, frag.residues[i - 1].ca);
      if (i + 2 < n) score += 0.5 * dist(pn, frag.residues[i + 2].ca);
      // keep N-CA-C angle near ideal 111 deg at residue i
      if (hasN[i]) {
        Vec3 v1 = unit(N[i] - ca0), v2 = unit(pc - ca0);
        double ang = std::acos(std::max(-1.0, std::min(1.0, dot(v1, v2)))) *
                     180.0 / M_PI;
        score -= std::fabs(ang - 111.0) * 0.2;
      }
      if (score > best_score) {
        best_score = score;
        bestC = pc;
        bestN = pn;
      }
    }
    C[i] = bestC;
    hasC[i] = true;
    N[i + 1] = bestN;
    hasN[i + 1] = true;
  }

  // terminal N(0) and C(n-1) by extension
  if (n >= 2) {
    Vec3 u = unit(frag.residues[0].ca - frag.residues[1].ca);
    N[0] = frag.residues[0].ca + u * 1.458;
    if (hasC[0]) {
      // keep the N-CA-C angle sane: rotate N around CA if needed
      N[0] = nerf(C[0], frag.residues[1].ca, frag.residues[0].ca, 1.458, 111.0,
                  150.0);
    }
    hasN[0] = true;
    size_t l = n - 1;
    if (hasN[l]) {
      C[l] = nerf(frag.residues[l - 1].ca, N[l], frag.residues[l].ca, 1.525,
                  111.0, -120.0);
    } else {
      C[l] = frag.residues[l].ca + Vec3(1.525, 0, 0);
    }
    hasC[l] = true;
  } else if (n == 1) {
    N[0] = frag.residues[0].ca + Vec3(-1.458, 0, 0);
    C[0] = frag.residues[0].ca + Vec3(1.525, 0, 0);
    hasN[0] = hasC[0] = true;
  }

  // carbonyl O: in the peptide plane, opposite the next N
  for (size_t i = 0; i < n; ++i) {
    if (i + 1 < n) {
      O[i] = nerf(frag.residues[i].ca, N[i + 1], C[i], 1.231, 120.5, 180.0);
    } else {
      O[i] = nerf(N[i], frag.residues[i].ca, C[i], 1.231, 120.5, 0.0);
    }
  }

  for (size_t i = 0; i < n; ++i) {
    Residue &r = frag.residues[i];
    r.atoms.push_back({"N", N[i], 'N'});
    r.atoms.push_back({"CA", r.ca, 'C'});
    r.atoms.push_back({"C", C[i], 'C'});
    r.atoms.push_back({"O", O[i], 'O'});
  }
}

// ---------------------------------------------------------------------------
// side chains

void build_sidechains(CAChainFragment &frag) {
  const auto &table = sidechain_table();
  for (Residue &r : frag.residues) {
    std::unordered_map<std::string, Vec3> pos;
    for (const Atom &a : r.atoms) pos[a.name] = a.pos;
    if (r.res_name == "GLY") continue;
    // CB: ideal L-amino-acid tetrahedral geometry
    Vec3 cb = nerf(pos["C"], pos["N"], pos["CA"], 1.530, 110.4, 122.55);
    pos["CB"] = cb;
    r.atoms.push_back({"CB", cb, 'C'});

    auto it = table.find(r.res_name);
    if (it == table.end()) continue;
    for (const IC &ic : it->second) {
      auto pa = pos.find(ic.a), pb = pos.find(ic.b), pc = pos.find(ic.c);
      if (pa == pos.end() || pb == pos.end() || pc == pos.end()) continue;
      Vec3 p = nerf(pa->second, pb->second, pc->second, ic.bond, ic.angle,
                    ic.dihedral);
      pos[ic.atom] = p;
      r.atoms.push_back({ic.atom, p, element_of(ic.atom)});
    }
  }
}

// ---------------------------------------------------------------------------
// excluded-volume relaxation on a spatial hash grid

struct HashGrid {
  double cell;
  std::unordered_map<long long, std::vector<int>> cells;
  explicit HashGrid(double c) : cell(c) {}
  long long key(const Vec3 &p) const {
    long long ix = (long long)std::floor(p.x / cell) + 100000;
    long long iy = (long long)std::floor(p.y / cell) + 100000;
    long long iz = (long long)std::floor(p.z / cell) + 100000;
    return (ix * 2000003LL + iy) * 2000003LL + iz;
  }
  void insert(const Vec3 &p, int id) { cells[key(p)].push_back(id); }
  template <typename F>
  void neighbors(const Vec3 &p, F f) const {
    for (int dx = -1; dx <= 1; ++dx)
      for (int dy = -1; dy <= 1; ++dy)
        for (int dz = -1; dz <= 1; ++dz) {
          Vec3 q = p + Vec3(dx * cell, dy * cell, dz * cell);
          auto it = cells.find(key(q));
          if (it == cells.end()) continue;
          for (int id : it->second) f(id);
        }
  }
};

void relax_clashes(std::vector<CAChainFragment> &frags, int iters = 3) {
  struct Ref {
    Atom *atom;
    int res_uid;
    bool backbone;
  };
  std::vector<Ref> all;
  int uid = 0;
  for (auto &f : frags) {
    for (auto &r : f.residues) {
      for (auto &a : r.atoms) {
        bool bb = a.name == "N" || a.name == "CA" || a.name == "C" ||
                  a.name == "O";
        all.push_back({&a, uid, bb});
      }
      ++uid;
    }
  }
  const double clash = 2.6;
  for (int it = 0; it < iters; ++it) {
    HashGrid grid(3.0);
    for (size_t i = 0; i < all.size(); ++i) grid.insert(all[i].atom->pos, (int)i);
    std::vector<Vec3> shift(all.size());
    for (size_t i = 0; i < all.size(); ++i) {
      if (all[i].backbone) continue;  // only move side-chain atoms
      Vec3 p = all[i].atom->pos;
      Vec3 s(0, 0, 0);
      grid.neighbors(p, [&](int j) {
        if ((size_t)j == i) return;
        if (std::abs(all[j].res_uid - all[i].res_uid) <= 1 &&
            all[j].res_uid != all[i].res_uid)
          return;  // skip bonded neighbors' residues
        if (all[j].res_uid == all[i].res_uid) return;
        Vec3 d = p - all[j].atom->pos;
        double dn = norm(d);
        if (dn < clash && dn > 1e-6) {
          s = s + unit(d) * ((clash - dn) * 0.4);
        }
      });
      shift[i] = s;
    }
    for (size_t i = 0; i < all.size(); ++i)
      all[i].atom->pos = all[i].atom->pos + shift[i];
  }
}

// ---------------------------------------------------------------------------

void write_pdb(const std::vector<CAChainFragment> &frags,
               const std::string &path) {
  std::ofstream out(path);
  int serial = 1;
  char last_chain = 0;
  for (const auto &f : frags) {
    for (const auto &r : f.residues) {
      if (last_chain != 0 && r.chain != last_chain) out << "TER\n";
      last_chain = r.chain;
      for (const auto &a : r.atoms) {
        char buf[96];
        std::string nm = a.name.size() < 4 ? " " + a.name : a.name;
        std::snprintf(buf, sizeof(buf),
                      "ATOM  %5d %-4s %3s %c%4d    %8.3f%8.3f%8.3f  1.00  0.00"
                      "          %2c",
                      serial++, nm.c_str(), r.res_name.c_str(), r.chain,
                      r.res_id, a.pos.x, a.pos.y, a.pos.z, a.element);
        out << buf << "\n";
      }
    }
  }
  out << "TER\nEND\n";
}

}  // namespace

int main(int argc, char **argv) {
  if (argc < 3) {
    std::cerr << "usage: mica_allatom <ca_model.pdb> <out.pdb>\n";
    return 2;
  }
  auto frags = read_ca_pdb(argv[1]);
  if (frags.empty()) {
    std::cerr << "no CA atoms found in " << argv[1] << "\n";
    return 1;
  }
  size_t total = 0;
  for (auto &f : frags) {
    if (f.residues.size() < 1) continue;
    build_backbone(f);
    build_sidechains(f);
    total += f.residues.size();
  }
  relax_clashes(frags);
  write_pdb(frags, argv[2]);
  std::cerr << "rebuilt " << total << " residues in " << frags.size()
            << " fragments\n";
  return 0;
}
