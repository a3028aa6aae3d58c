// Flat binary serialization of CompiledModel (.dwbcm).
//
// Layout (little-endian):
//   char[8]  magic "DWBCM001"
//   i64      floating, nbody, ndof, model_dof
//   string   name                    (i64 length + bytes)
//   nbody x string body_names
//   nbody x string joint_names
//   i32[nbody]   parent
//   i32[nbody]   q_index
//   f64[nbody*9] X_T_rot     (row-major per body)
//   f64[nbody*3] X_T_trans
//   f64[nbody*3] axis
//   f64[nbody]   mass
//   f64[nbody*3] com
//   f64[nbody*9] inertia
//   f64[model_dof] x5  joint_limit_lower/upper, effort, velocity, damping
//   i64 n_fixed; per entry: string name, i64 body, f64[9] R, f64[3] p
#include <cstring>
#include <fstream>

#include "dwbc_host/model.h"

namespace dwbc_host {
namespace {

constexpr char kMagic[8] = {'D', 'W', 'B', 'C', 'M', '0', '0', '1'};

void write_str(std::ofstream& f, const std::string& s) {
  int64_t n = static_cast<int64_t>(s.size());
  f.write(reinterpret_cast<const char*>(&n), 8);
  f.write(s.data(), n);
}

bool read_str(std::ifstream& f, std::string* s) {
  int64_t n = 0;
  if (!f.read(reinterpret_cast<char*>(&n), 8)) return false;
  s->resize(n);
  return static_cast<bool>(f.read(s->data(), n));
}

template <typename T>
void write_vec(std::ofstream& f, const std::vector<T>& v) {
  f.write(reinterpret_cast<const char*>(v.data()), v.size() * sizeof(T));
}

template <typename T>
bool read_vec(std::ifstream& f, std::vector<T>* v, size_t n) {
  v->resize(n);
  return static_cast<bool>(
      f.read(reinterpret_cast<char*>(v->data()), n * sizeof(T)));
}

}  // namespace

bool CompiledModel::save(const std::string& path) const {
  std::ofstream f(path, std::ios::binary | std::ios::trunc);
  if (!f) return false;
  f.write(kMagic, 8);
  int64_t hdr[4] = {floating ? 1 : 0, nbody, ndof, model_dof};
  f.write(reinterpret_cast<const char*>(hdr), sizeof(hdr));
  write_str(f, name);
  for (auto& s : body_names) write_str(f, s);
  for (auto& s : joint_names) write_str(f, s);
  write_vec(f, parent);
  write_vec(f, q_index);
  write_vec(f, X_T_rot);
  write_vec(f, X_T_trans);
  write_vec(f, axis);
  write_vec(f, mass);
  write_vec(f, com);
  write_vec(f, inertia);
  write_vec(f, joint_limit_lower);
  write_vec(f, joint_limit_upper);
  write_vec(f, effort_limit);
  write_vec(f, velocity_limit);
  write_vec(f, damping);
  int64_t nf = static_cast<int64_t>(fixed_frames.size());
  f.write(reinterpret_cast<const char*>(&nf), 8);
  for (auto& kv : fixed_frames) {
    write_str(f, kv.first);
    int64_t body = std::get<0>(kv.second);
    f.write(reinterpret_cast<const char*>(&body), 8);
    f.write(reinterpret_cast<const char*>(std::get<1>(kv.second).data()), 72);
    f.write(reinterpret_cast<const char*>(std::get<2>(kv.second).data()), 24);
  }
  return static_cast<bool>(f);
}

bool CompiledModel::load(const std::string& path, CompiledModel* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  char magic[8];
  if (!f.read(magic, 8) || std::memcmp(magic, kMagic, 8) != 0) return false;
  int64_t hdr[4];
  if (!f.read(reinterpret_cast<char*>(hdr), sizeof(hdr))) return false;
  out->floating = hdr[0] != 0;
  out->nbody = static_cast<int>(hdr[1]);
  out->ndof = static_cast<int>(hdr[2]);
  out->model_dof = static_cast<int>(hdr[3]);
  if (!read_str(f, &out->name)) return false;
  out->body_names.resize(out->nbody);
  out->joint_names.resize(out->nbody);
  for (auto& s : out->body_names)
    if (!read_str(f, &s)) return false;
  for (auto& s : out->joint_names)
    if (!read_str(f, &s)) return false;
  size_t nb = out->nbody, md = out->model_dof;
  if (!read_vec(f, &out->parent, nb)) return false;
  if (!read_vec(f, &out->q_index, nb)) return false;
  if (!read_vec(f, &out->X_T_rot, nb)) return false;
  if (!read_vec(f, &out->X_T_trans, nb)) return false;
  if (!read_vec(f, &out->axis, nb)) return false;
  if (!read_vec(f, &out->mass, nb)) return false;
  if (!read_vec(f, &out->com, nb)) return false;
  if (!read_vec(f, &out->inertia, nb)) return false;
  if (!read_vec(f, &out->joint_limit_lower, md)) return false;
  if (!read_vec(f, &out->joint_limit_upper, md)) return false;
  if (!read_vec(f, &out->effort_limit, md)) return false;
  if (!read_vec(f, &out->velocity_limit, md)) return false;
  if (!read_vec(f, &out->damping, md)) return false;
  int64_t nf = 0;
  if (!f.read(reinterpret_cast<char*>(&nf), 8)) return false;
  for (int64_t i = 0; i < nf; ++i) {
    std::string nm;
    if (!read_str(f, &nm)) return false;
    int64_t body;
    Mat3 R;
    Vec3 p;
    if (!f.read(reinterpret_cast<char*>(&body), 8)) return false;
    if (!f.read(reinterpret_cast<char*>(R.data()), 72)) return false;
    if (!f.read(reinterpret_cast<char*>(p.data()), 24)) return false;
    out->fixed_frames[nm] = {static_cast<int>(body), R, p};
  }
  out->total_mass = 0;
  for (double m : out->mass) out->total_mass += m;
  return true;
}

}  // namespace dwbc_host
