// URDF -> CompiledModel: the native model compiler.
//
// Same algorithm as libdwbc_tpu/model/compile.py (pre-order DFS, children
// alphabetical by joint name, fixed-joint inertia lumping); the two
// implementations are cross-checked by tests/test_native.py.
#include <algorithm>
#include <cmath>
#include <cstring>
#include <fstream>
#include <sstream>

#include "dwbc_host/model.h"
#include "xml.h"

namespace dwbc_host {
namespace {

Mat3 matmul(const Mat3& a, const Mat3& b) {
  Mat3 r{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += a[i * 3 + k] * b[k * 3 + j];
      r[i * 3 + j] = s;
    }
  return r;
}

Vec3 matvec(const Mat3& a, const Vec3& v) {
  Vec3 r{};
  for (int i = 0; i < 3; ++i)
    r[i] = a[i * 3] * v[0] + a[i * 3 + 1] * v[1] + a[i * 3 + 2] * v[2];
  return r;
}

Mat3 transpose(const Mat3& a) {
  Mat3 r{};
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) r[i * 3 + j] = a[j * 3 + i];
  return r;
}

Mat3 rpy_to_matrix(const Vec3& rpy) {
  double cr = std::cos(rpy[0]), sr = std::sin(rpy[0]);
  double cp = std::cos(rpy[1]), sp = std::sin(rpy[1]);
  double cy = std::cos(rpy[2]), sy = std::sin(rpy[2]);
  Mat3 Rx{1, 0, 0, 0, cr, -sr, 0, sr, cr};
  Mat3 Ry{cp, 0, sp, 0, 1, 0, -sp, 0, cp};
  Mat3 Rz{cy, -sy, 0, sy, cy, 0, 0, 0, 1};
  return matmul(Rz, matmul(Ry, Rx));
}

Mat3 skew(const Vec3& v) {
  return Mat3{0, -v[2], v[1], v[2], 0, -v[0], -v[1], v[0], 0};
}

Mat3 add(const Mat3& a, const Mat3& b) {
  Mat3 r;
  for (int i = 0; i < 9; ++i) r[i] = a[i] + b[i];
  return r;
}

Mat3 sub(const Mat3& a, const Mat3& b) {
  Mat3 r;
  for (int i = 0; i < 9; ++i) r[i] = a[i] - b[i];
  return r;
}

Mat3 scale(const Mat3& a, double s) {
  Mat3 r;
  for (int i = 0; i < 9; ++i) r[i] = a[i] * s;
  return r;
}

Vec3 parse_vec3(const std::string* s, double def = 0.0) {
  Vec3 v{def, def, def};
  if (!s) return v;
  std::istringstream is(*s);
  is >> v[0] >> v[1] >> v[2];
  return v;
}

struct Inertial {
  double mass = 0;
  Vec3 com{};
  Mat3 inertia{};
};

struct UrdfJoint {
  std::string name, type, parent, child;
  Vec3 xyz{}, rpy{}, axis{1, 0, 0};
  double lower = -1e308, upper = 1e308, effort = 1e308, velocity = 1e308;
  double damping = 0;
};

// Lump body b (pose R,p in a's frame) into a — Link::AddLink math
// (/root/reference/src/link.cpp:247-269).
void merge_inertial(Inertial* a, const Inertial& b_local, const Mat3& R,
                    const Vec3& p) {
  double new_mass = a->mass + b_local.mass;
  if (new_mass == 0) return;
  Vec3 com_b = matvec(R, b_local.com);
  for (int i = 0; i < 3; ++i) com_b[i] += p[i];
  Mat3 I_b = matmul(R, matmul(b_local.inertia, transpose(R)));

  Vec3 new_com;
  for (int i = 0; i < 3; ++i)
    new_com[i] = (a->mass * a->com[i] + b_local.mass * com_b[i]) / new_mass;

  Mat3 sa = skew(a->com), sb = skew(com_b), sn = skew(new_com);
  Mat3 Ia_o = add(a->inertia, scale(matmul(sa, transpose(sa)), a->mass));
  Mat3 Ib_o = add(I_b, scale(matmul(sb, transpose(sb)), b_local.mass));
  a->inertia = sub(add(Ia_o, Ib_o), scale(matmul(sn, transpose(sn)), new_mass));
  a->mass = new_mass;
  a->com = new_com;
}

struct Builder {
  const XmlNode* robot;
  std::map<std::string, const XmlNode*> links;
  std::map<std::string, UrdfJoint> joints;
  std::map<std::string, std::vector<std::string>> child_joints;  // sorted

  CompiledModel* m;
  int next_q;

  Inertial parse_inertial(const XmlNode* link) {
    Inertial out;
    const XmlNode* in = link->find("inertial");
    if (!in) return out;
    if (const XmlNode* o = in->find("origin")) {
      out.com = parse_vec3(o->attr("xyz"));
      Vec3 rpy = parse_vec3(o->attr("rpy"));
      if (rpy[0] || rpy[1] || rpy[2]) {
        // rotate inertia into the link frame
        Mat3 R = rpy_to_matrix(rpy);
        // inertia parsed below; flag via storing R — handled after parse
        // (we parse inertia first then rotate; reorganized below)
        const XmlNode* it = in->find("inertia");
        Mat3 I{};
        if (it) {
          auto g = [&](const char* k) {
            const std::string* s = it->attr(k);
            return s ? std::stod(*s) : 0.0;
          };
          double xx = g("ixx"), xy = g("ixy"), xz = g("ixz"), yy = g("iyy"),
                 yz = g("iyz"), zz = g("izz");
          I = Mat3{xx, xy, xz, xy, yy, yz, xz, yz, zz};
        }
        out.inertia = matmul(R, matmul(I, transpose(R)));
        if (const XmlNode* ms = in->find("mass"))
          if (const std::string* v = ms->attr("value")) out.mass = std::stod(*v);
        return out;
      }
    }
    if (const XmlNode* ms = in->find("mass"))
      if (const std::string* v = ms->attr("value")) out.mass = std::stod(*v);
    if (const XmlNode* it = in->find("inertia")) {
      auto g = [&](const char* k) {
        const std::string* s = it->attr(k);
        return s ? std::stod(*s) : 0.0;
      };
      double xx = g("ixx"), xy = g("ixy"), xz = g("ixz"), yy = g("iyy"),
             yz = g("iyz"), zz = g("izz");
      out.inertia = Mat3{xx, xy, xz, xy, yy, yz, xz, yz, zz};
    }
    return out;
  }

  void add_body(const std::string& link_name, const std::string& joint_name,
                int parent_idx, const Mat3& R, const Vec3& p, const Vec3& axis,
                const UrdfJoint* j) {
    Inertial in = parse_inertial(links[link_name]);
    m->body_names.push_back(link_name);
    m->joint_names.push_back(joint_name);
    m->parent.push_back(parent_idx);
    m->q_index.push_back(next_q++);
    m->X_T_rot.push_back(R);
    m->X_T_trans.push_back(p);
    m->axis.push_back(axis);
    m->mass.push_back(in.mass);
    m->com.push_back(in.com);
    m->inertia.push_back(in.inertia);
    if (j) {
      m->joint_limit_lower.push_back(j->lower);
      m->joint_limit_upper.push_back(j->upper);
      m->effort_limit.push_back(j->effort);
      m->velocity_limit.push_back(j->velocity);
      m->damping.push_back(j->damping);
    }
  }

  void lump_fixed(int body_idx, const std::string& link_name, const Mat3& R,
                  const Vec3& p) {
    m->fixed_frames[link_name] = {body_idx, R, p};
    Inertial sub = parse_inertial(links[link_name]);
    Inertial acc{m->mass[body_idx], m->com[body_idx], m->inertia[body_idx]};
    merge_inertial(&acc, sub, R, p);
    m->mass[body_idx] = acc.mass;
    m->com[body_idx] = acc.com;
    m->inertia[body_idx] = acc.inertia;
    for (const std::string& jn : child_joints[link_name]) {
      const UrdfJoint& j = joints[jn];
      Mat3 Rj = rpy_to_matrix(j.rpy);
      Vec3 pj = matvec(R, j.xyz);
      for (int i = 0; i < 3; ++i) pj[i] += p[i];
      Mat3 Rc = matmul(R, Rj);
      if (j.type == "fixed")
        lump_fixed(body_idx, j.child, Rc, pj);
      else
        add_moving(body_idx, j, Rc, pj);
    }
  }

  void add_moving(int parent_idx, const UrdfJoint& j, const Mat3& R,
                  const Vec3& p) {
    int idx = static_cast<int>(m->body_names.size());
    add_body(j.child, j.name, parent_idx, R, p, j.axis, &j);
    walk(idx, j.child);
  }

  void walk(int body_idx, const std::string& link_name) {
    for (const std::string& jn : child_joints[link_name]) {
      const UrdfJoint& j = joints[jn];
      Mat3 Rj = rpy_to_matrix(j.rpy);
      if (j.type == "fixed")
        lump_fixed(body_idx, j.child, Rj, j.xyz);
      else
        add_moving(body_idx, j, Rj, j.xyz);
    }
  }
};

}  // namespace

bool compile_urdf(const std::string& urdf_path, bool floating,
                  CompiledModel* out, std::string* error) {
  std::ifstream f(urdf_path);
  if (!f) {
    *error = "cannot open " + urdf_path;
    return false;
  }
  std::stringstream ss;
  ss << f.rdbuf();
  auto root = parse_xml(ss.str(), error);
  if (!root) return false;
  if (root->tag != "robot") {
    *error = "root element is not <robot>";
    return false;
  }

  Builder b;
  b.robot = root.get();
  b.m = out;
  if (const std::string* nm = root->attr("name")) out->name = *nm;
  out->floating = floating;

  for (const XmlNode* l : root->find_all("link")) {
    const std::string* nm = l->attr("name");
    if (nm) b.links[*nm] = l;
  }
  for (const XmlNode* jn : root->find_all("joint")) {
    UrdfJoint j;
    const std::string* nm = jn->attr("name");
    const std::string* ty = jn->attr("type");
    if (!nm || !ty) continue;
    j.name = *nm;
    j.type = *ty;
    if (const XmlNode* pn = jn->find("parent")) j.parent = *pn->attr("link");
    if (const XmlNode* cn = jn->find("child")) j.child = *cn->attr("link");
    if (const XmlNode* o = jn->find("origin")) {
      j.xyz = parse_vec3(o->attr("xyz"));
      j.rpy = parse_vec3(o->attr("rpy"));
    }
    if (const XmlNode* ax = jn->find("axis")) j.axis = parse_vec3(ax->attr("xyz"));
    if (const XmlNode* li = jn->find("limit")) {
      auto g = [&](const char* k, double def) {
        const std::string* s = li->attr(k);
        return s ? std::stod(*s) : def;
      };
      j.lower = g("lower", -1e308);
      j.upper = g("upper", 1e308);
      j.effort = g("effort", 1e308);
      j.velocity = g("velocity", 1e308);
    }
    if (const XmlNode* dn = jn->find("dynamics")) {
      const std::string* s = dn->attr("damping");
      if (s) j.damping = std::stod(*s);
    }
    b.joints[j.name] = j;
  }

  // root link: never a child
  std::map<std::string, bool> is_child;
  for (auto& kv : b.joints) is_child[kv.second.child] = true;
  std::string root_link;
  for (auto& kv : b.links)
    if (!is_child.count(kv.first)) {
      if (!root_link.empty()) {
        *error = "multiple root links";
        return false;
      }
      root_link = kv.first;
    }
  if (root_link.empty()) {
    *error = "no root link";
    return false;
  }

  // child joints sorted alphabetically (std::map iteration order)
  for (auto& kv : b.joints)
    b.child_joints[kv.second.parent].push_back(kv.first);
  for (auto& kv : b.child_joints) std::sort(kv.second.begin(), kv.second.end());

  b.next_q = floating ? 6 : 0;
  {
    Inertial in = b.parse_inertial(b.links[root_link]);
    out->body_names.push_back(root_link);
    out->joint_names.push_back("");
    out->parent.push_back(-1);
    out->q_index.push_back(0);
    out->X_T_rot.push_back(Mat3{1, 0, 0, 0, 1, 0, 0, 0, 1});
    out->X_T_trans.push_back(Vec3{});
    out->axis.push_back(Vec3{});
    out->mass.push_back(in.mass);
    out->com.push_back(in.com);
    out->inertia.push_back(in.inertia);
  }
  b.walk(0, root_link);

  out->nbody = static_cast<int>(out->body_names.size());
  out->ndof = b.next_q;
  out->model_dof = out->ndof - (floating ? 6 : 0);
  out->total_mass = 0;
  for (double mi : out->mass) out->total_mass += mi;
  return true;
}

}  // namespace dwbc_host
