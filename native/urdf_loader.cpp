// TPU-native crocoddyl: native URDF robot loader.
//
// The reference loads robots through Pinocchio's C++ URDF parser
// (reference: include/crocoddyl/multibody/states/multibody.hxx:25-35 reads
// URDF-derived limits; examples load models via example_robot_data URDFs).
// This is our native equivalent: a dependency-free C++17 URDF parser that
// flattens a kinematic tree into the array layout consumed by
// crocoddyl_tpu.dynamics.model.RobotModel (joint types/parents/placements/
// axes/inertias/frames/limits).
//
// Fixed joints are merged: their body inertias are composited into the
// parent moving joint's frame and their links become operational frames —
// the same reduction pinocchio::urdf::buildModel performs.
//
// C ABI: crocotpu_parse_urdf() returns a malloc'd JSON description of the
// flattened model (numbers printed at %.17g, lossless for doubles); the
// Python side (crocoddyl_tpu/io/urdf.py) turns it into a RobotModel pytree.
// JSON is used because this runs once at problem-build time; all hot-path
// compute stays in XLA.

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <memory>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Minimal XML parser (elements, attributes, comments, CDATA-free URDF subset)
// ---------------------------------------------------------------------------
struct XmlNode {
  std::string tag;
  std::map<std::string, std::string> attrs;
  std::vector<std::unique_ptr<XmlNode>> children;

  const XmlNode* child(const std::string& t) const {
    for (const auto& c : children)
      if (c->tag == t) return c.get();
    return nullptr;
  }
  std::vector<const XmlNode*> all(const std::string& t) const {
    std::vector<const XmlNode*> out;
    for (const auto& c : children)
      if (c->tag == t) out.push_back(c.get());
    return out;
  }
  std::string attr(const std::string& k, const std::string& dflt = "") const {
    auto it = attrs.find(k);
    return it == attrs.end() ? dflt : it->second;
  }
};

class XmlParser {
 public:
  explicit XmlParser(const std::string& text) : s_(text), i_(0) {}

  std::unique_ptr<XmlNode> parse() {
    skip_misc();
    return parse_element();
  }

 private:
  const std::string& s_;
  size_t i_;

  [[noreturn]] void fail(const std::string& msg) {
    throw std::runtime_error("urdf xml: " + msg + " @byte " +
                             std::to_string(i_));
  }
  bool starts(const char* p) const {
    return s_.compare(i_, strlen(p), p) == 0;
  }
  void skip_ws() {
    while (i_ < s_.size() && isspace((unsigned char)s_[i_])) ++i_;
  }
  void skip_misc() {  // whitespace, comments, <?xml?>, <!DOCTYPE>
    for (;;) {
      skip_ws();
      if (starts("<!--")) {
        size_t e = s_.find("-->", i_);
        if (e == std::string::npos) fail("unterminated comment");
        i_ = e + 3;
      } else if (starts("<?")) {
        size_t e = s_.find("?>", i_);
        if (e == std::string::npos) fail("unterminated <?");
        i_ = e + 2;
      } else if (starts("<!")) {
        size_t e = s_.find('>', i_);
        if (e == std::string::npos) fail("unterminated <!");
        i_ = e + 1;
      } else {
        return;
      }
    }
  }
  std::string parse_name() {
    size_t b = i_;
    while (i_ < s_.size() &&
           (isalnum((unsigned char)s_[i_]) || strchr("_-:.", s_[i_])))
      ++i_;
    if (i_ == b) fail("expected name");
    return s_.substr(b, i_ - b);
  }
  std::string parse_quoted() {
    if (i_ >= s_.size() || (s_[i_] != '"' && s_[i_] != '\'')) {
      fail("expected quote");
    }
    char q = s_[i_++];
    size_t b = i_;
    size_t e = s_.find(q, i_);
    if (e == std::string::npos) fail("unterminated attribute");
    i_ = e + 1;
    std::string raw = s_.substr(b, e - b);
    // Minimal entity decoding (URDF attrs rarely need more).
    std::string out;
    for (size_t k = 0; k < raw.size(); ++k) {
      if (raw[k] == '&') {
        if (raw.compare(k, 5, "&amp;") == 0) { out += '&'; k += 4; }
        else if (raw.compare(k, 4, "&lt;") == 0) { out += '<'; k += 3; }
        else if (raw.compare(k, 4, "&gt;") == 0) { out += '>'; k += 3; }
        else if (raw.compare(k, 6, "&quot;") == 0) { out += '"'; k += 5; }
        else if (raw.compare(k, 6, "&apos;") == 0) { out += '\''; k += 5; }
        else out += raw[k];
      } else {
        out += raw[k];
      }
    }
    return out;
  }
  std::unique_ptr<XmlNode> parse_element() {
    if (i_ >= s_.size() || s_[i_] != '<') fail("expected '<'");
    ++i_;
    auto node = std::make_unique<XmlNode>();
    node->tag = parse_name();
    for (;;) {
      skip_ws();
      if (i_ >= s_.size()) fail("unterminated tag");
      if (starts("/>")) {
        i_ += 2;
        return node;
      }
      if (s_[i_] == '>') {
        ++i_;
        break;
      }
      std::string k = parse_name();
      skip_ws();
      if (i_ >= s_.size() || s_[i_] != '=') fail("expected '='");
      ++i_;
      skip_ws();
      node->attrs[k] = parse_quoted();
    }
    // children / text until matching close tag
    for (;;) {
      // skip text content (URDF carries data in attributes)
      while (i_ < s_.size() && s_[i_] != '<') ++i_;
      if (i_ >= s_.size()) fail("missing </" + node->tag + ">");
      if (starts("<!--")) {
        size_t e = s_.find("-->", i_);
        if (e == std::string::npos) fail("unterminated comment");
        i_ = e + 3;
        continue;
      }
      if (starts("</")) {
        i_ += 2;
        std::string close = parse_name();
        if (close != node->tag)
          fail("mismatched </" + close + "> for <" + node->tag + ">");
        skip_ws();
        if (i_ >= s_.size() || s_[i_] != '>') fail("expected '>'");
        ++i_;
        return node;
      }
      node->children.push_back(parse_element());
    }
  }
};

// ---------------------------------------------------------------------------
// Small 3D math (row-major 3x3)
// ---------------------------------------------------------------------------
struct Mat3 {
  double m[9];
  static Mat3 eye() { return {{1, 0, 0, 0, 1, 0, 0, 0, 1}}; }
  Mat3 operator*(const Mat3& o) const {
    Mat3 r{};
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) {
        double a = 0;
        for (int k = 0; k < 3; ++k) a += m[i * 3 + k] * o.m[k * 3 + j];
        r.m[i * 3 + j] = a;
      }
    return r;
  }
  Mat3 t() const {
    Mat3 r{};
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) r.m[i * 3 + j] = m[j * 3 + i];
    return r;
  }
};
struct Vec3 {
  double v[3];
};
inline Vec3 mul(const Mat3& R, const Vec3& x) {
  Vec3 r{};
  for (int i = 0; i < 3; ++i)
    r.v[i] = R.m[i * 3] * x.v[0] + R.m[i * 3 + 1] * x.v[1] +
             R.m[i * 3 + 2] * x.v[2];
  return r;
}
inline Vec3 add(const Vec3& a, const Vec3& b) {
  return {{a.v[0] + b.v[0], a.v[1] + b.v[1], a.v[2] + b.v[2]}};
}
inline Vec3 sub(const Vec3& a, const Vec3& b) {
  return {{a.v[0] - b.v[0], a.v[1] - b.v[1], a.v[2] - b.v[2]}};
}
struct Transform {  // X.R, X.p : child→parent placement
  Mat3 R;
  Vec3 p;
  static Transform id() { return {Mat3::eye(), {{0, 0, 0}}}; }
  Transform operator*(const Transform& o) const {  // this ∘ o
    return {R * o.R, add(p, mul(R, o.p))};
  }
};
inline Mat3 rpy_to_R(double r, double p, double y) {
  // URDF fixed-axis RPY: R = Rz(y) * Ry(p) * Rx(r)
  double cr = cos(r), sr = sin(r), cp = cos(p), sp = sin(p), cy = cos(y),
         sy = sin(y);
  Mat3 R{};
  R.m[0] = cy * cp;
  R.m[1] = cy * sp * sr - sy * cr;
  R.m[2] = cy * sp * cr + sy * sr;
  R.m[3] = sy * cp;
  R.m[4] = sy * sp * sr + cy * cr;
  R.m[5] = sy * sp * cr - cy * sr;
  R.m[6] = -sp;
  R.m[7] = cp * sr;
  R.m[8] = cp * cr;
  return R;
}
inline Mat3 skew(const Vec3& a) {
  return {{0, -a.v[2], a.v[1], a.v[2], 0, -a.v[0], -a.v[1], a.v[0], 0}};
}
inline Mat3 addm(const Mat3& a, const Mat3& b, double s = 1.0) {
  Mat3 r{};
  for (int i = 0; i < 9; ++i) r.m[i] = a.m[i] + s * b.m[i];
  return r;
}

// Spatial rigid-body inertia about a body frame origin, stored as
// (mass, com in frame, rotational inertia about the com, expressed in frame).
struct BodyInertia {
  double mass = 0.0;
  Vec3 com{{0, 0, 0}};
  Mat3 I_com{{0, 0, 0, 0, 0, 0, 0, 0, 0}};
};

// Express a body inertia given in frame B in frame A, X = A_X_B (B→A).
BodyInertia transform_inertia(const Transform& X, const BodyInertia& b) {
  BodyInertia out;
  out.mass = b.mass;
  out.com = add(X.p, mul(X.R, b.com));
  out.I_com = X.R * b.I_com * X.R.t();
  return out;
}
// Sum of two inertias expressed in the same frame (parallel-axis composition).
BodyInertia sum_inertia(const BodyInertia& a, const BodyInertia& b) {
  BodyInertia out;
  out.mass = a.mass + b.mass;
  if (out.mass <= 0) {
    out.com = {{0, 0, 0}};
    out.I_com = a.I_com;
    for (int i = 0; i < 9; ++i) out.I_com.m[i] += b.I_com.m[i];
    return out;
  }
  for (int i = 0; i < 3; ++i)
    out.com.v[i] =
        (a.mass * a.com.v[i] + b.mass * b.com.v[i]) / out.mass;
  auto shift = [&](const BodyInertia& x) {
    Vec3 d = sub(x.com, out.com);
    Mat3 S = skew(d);
    // I_about_newcom = I_com + m * S * S^T  (steiner)
    Mat3 SST = S * S.t();
    Mat3 r = x.I_com;
    for (int i = 0; i < 9; ++i) r.m[i] += x.mass * SST.m[i];
    return r;
  };
  Mat3 ia = shift(a), ib = shift(b);
  out.I_com = addm(ia, ib);
  return out;
}

// ---------------------------------------------------------------------------
// URDF semantics
// ---------------------------------------------------------------------------
struct UrdfJoint {
  std::string name, type, parent_link, child_link;
  Transform origin = Transform::id();
  Vec3 axis{{1, 0, 0}};
  double lower = -INFINITY, upper = INFINITY;
  double velocity = INFINITY, effort = INFINITY;
};
struct UrdfLink {
  std::string name;
  BodyInertia inertia;  // in link frame
  bool has_inertial = false;
};

Vec3 parse_vec3(const std::string& s, const Vec3& dflt) {
  if (s.empty()) return dflt;
  Vec3 v{};
  if (sscanf(s.c_str(), "%lf %lf %lf", &v.v[0], &v.v[1], &v.v[2]) != 3)
    throw std::runtime_error("bad vec3: " + s);
  return v;
}
Transform parse_origin(const XmlNode* el) {
  Transform X = Transform::id();
  if (!el) return X;
  const XmlNode* o = el->child("origin");
  if (!o) return X;
  X.p = parse_vec3(o->attr("xyz"), {{0, 0, 0}});
  Vec3 rpy = parse_vec3(o->attr("rpy"), {{0, 0, 0}});
  X.R = rpy_to_R(rpy.v[0], rpy.v[1], rpy.v[2]);
  return X;
}

struct FlatModel {
  // mirrors crocoddyl_tpu.dynamics.model.ModelBuilder rows
  std::vector<int> joint_types;  // 0 free-flyer, 1 revolute, 2 prismatic
  std::vector<int> parents;
  std::vector<std::string> joint_names;
  std::vector<Transform> jp;
  std::vector<Vec3> axes;
  std::vector<BodyInertia> bodies;
  std::vector<double> q_lb, q_ub, v_limit, effort_limit;
  std::vector<std::string> frame_names;
  std::vector<int> frame_parents;
  std::vector<Transform> fp;
  std::string robot_name;
};

class UrdfModelBuilder {
 public:
  UrdfModelBuilder(const XmlNode& root, bool floating_base)
      : floating_base_(floating_base) {
    if (root.tag != "robot") throw std::runtime_error("root is not <robot>");
    out_.robot_name = root.attr("name", "robot");
    for (const XmlNode* l : root.all("link")) parse_link(*l);
    for (const XmlNode* j : root.all("joint")) parse_joint(*j);
    build();
  }
  FlatModel take() { return std::move(out_); }

 private:
  bool floating_base_;
  std::map<std::string, UrdfLink> links_;
  std::vector<UrdfJoint> joints_;
  std::map<std::string, std::vector<int>> children_of_;  // link → joint idx
  FlatModel out_;

  void parse_link(const XmlNode& el) {
    UrdfLink link;
    link.name = el.attr("name");
    if (link.name.empty()) throw std::runtime_error("link without name");
    const XmlNode* in = el.child("inertial");
    if (in) {
      link.has_inertial = true;
      Transform X = parse_origin(in);
      const XmlNode* me = in->child("mass");
      double mass = me ? atof(me->attr("value", "0").c_str()) : 0.0;
      const XmlNode* ie = in->child("inertia");
      Mat3 I{};
      if (ie) {
        double ixx = atof(ie->attr("ixx", "0").c_str());
        double iyy = atof(ie->attr("iyy", "0").c_str());
        double izz = atof(ie->attr("izz", "0").c_str());
        double ixy = atof(ie->attr("ixy", "0").c_str());
        double ixz = atof(ie->attr("ixz", "0").c_str());
        double iyz = atof(ie->attr("iyz", "0").c_str());
        I = {{ixx, ixy, ixz, ixy, iyy, iyz, ixz, iyz, izz}};
      }
      BodyInertia bi;
      bi.mass = mass;
      bi.com = {{0, 0, 0}};
      bi.I_com = I;  // URDF inertia is about the inertial-origin == com frame
      // inertial origin maps com frame → link frame
      link.inertia = transform_inertia(X, bi);
    }
    links_[link.name] = link;
  }

  void parse_joint(const XmlNode& el) {
    UrdfJoint j;
    j.name = el.attr("name");
    j.type = el.attr("type");
    const XmlNode* p = el.child("parent");
    const XmlNode* c = el.child("child");
    if (!p || !c) throw std::runtime_error("joint missing parent/child");
    j.parent_link = p->attr("link");
    j.child_link = c->attr("link");
    j.origin = parse_origin(&el);
    const XmlNode* ax = el.child("axis");
    if (ax) {
      j.axis = parse_vec3(ax->attr("xyz"), {{1, 0, 0}});
      double n = sqrt(j.axis.v[0] * j.axis.v[0] + j.axis.v[1] * j.axis.v[1] +
                      j.axis.v[2] * j.axis.v[2]);
      if (n > 0)
        for (auto& a : j.axis.v) a /= n;
    }
    const XmlNode* lim = el.child("limit");
    if (lim) {
      if (!lim->attr("lower").empty()) j.lower = atof(lim->attr("lower").c_str());
      if (!lim->attr("upper").empty()) j.upper = atof(lim->attr("upper").c_str());
      if (!lim->attr("velocity").empty())
        j.velocity = atof(lim->attr("velocity").c_str());
      if (!lim->attr("effort").empty())
        j.effort = atof(lim->attr("effort").c_str());
    }
    if (j.type == "continuous") {
      j.type = "revolute";
      j.lower = -INFINITY;
      j.upper = INFINITY;
    }
    children_of_[j.parent_link].push_back((int)joints_.size());
    joints_.push_back(j);
  }

  std::string find_root_link() const {
    std::map<std::string, bool> is_child;
    for (const auto& j : joints_) is_child[j.child_link] = true;
    for (const auto& kv : links_)
      if (!is_child.count(kv.first)) return kv.first;
    throw std::runtime_error("no root link (kinematic loop?)");
  }

  // Recursively flatten: `link` is rigidly attached to moving joint `jid`
  // (our flat index; -1 = world) with placement X (link frame → joint frame).
  void attach(const std::string& link_name, int jid, const Transform& X) {
    const UrdfLink& link = links_.at(link_name);
    if (jid >= 0) {
      out_.bodies[jid] =
          sum_inertia(out_.bodies[jid], transform_inertia(X, link.inertia));
      out_.frame_names.push_back(link_name);
      out_.frame_parents.push_back(jid);
      out_.fp.push_back(X);
    }
    auto it = children_of_.find(link_name);
    if (it == children_of_.end()) return;
    for (int cj : it->second) {
      const UrdfJoint& j = joints_[cj];
      Transform Xj = X * j.origin;  // child-joint frame in current joint frame
      if (j.type == "fixed") {
        attach(j.child_link, jid, Xj);
      } else if (j.type == "revolute" || j.type == "prismatic" ||
                 j.type == "floating") {
        int nid = (int)out_.joint_types.size();
        int jt = j.type == "floating" ? 0 : (j.type == "revolute" ? 1 : 2);
        out_.joint_types.push_back(jt);
        out_.parents.push_back(jid);
        out_.joint_names.push_back(j.name);
        out_.jp.push_back(Xj);
        out_.axes.push_back(j.axis);
        out_.bodies.push_back(BodyInertia{});
        if (jt == 0) {
          for (int k = 0; k < 7; ++k) {
            out_.q_lb.push_back(-INFINITY);
            out_.q_ub.push_back(INFINITY);
          }
          for (int k = 0; k < 6; ++k) {
            out_.v_limit.push_back(j.velocity);
            out_.effort_limit.push_back(j.effort);
          }
        } else {
          out_.q_lb.push_back(j.lower);
          out_.q_ub.push_back(j.upper);
          out_.v_limit.push_back(j.velocity);
          out_.effort_limit.push_back(j.effort);
        }
        attach(j.child_link, nid, Transform::id());
      } else {
        throw std::runtime_error("unsupported joint type: " + j.type);
      }
    }
  }

  void build() {
    std::string root = find_root_link();
    if (floating_base_) {
      out_.joint_types.push_back(0);
      out_.parents.push_back(-1);
      out_.joint_names.push_back("root_joint");
      out_.jp.push_back(Transform::id());
      out_.axes.push_back({{0, 0, 1}});
      out_.bodies.push_back(BodyInertia{});
      for (int k = 0; k < 7; ++k) {
        out_.q_lb.push_back(-INFINITY);
        out_.q_ub.push_back(INFINITY);
      }
      for (int k = 0; k < 6; ++k) {
        out_.v_limit.push_back(INFINITY);
        out_.effort_limit.push_back(INFINITY);
      }
      attach(root, 0, Transform::id());
    } else {
      // fixed base: root link is welded to the world; its own inertia is
      // unreachable (matches pinocchio, which drops the universe inertia)
      attach(root, -1, Transform::id());
    }
    if (out_.joint_types.empty())
      throw std::runtime_error("model has no movable joints");
  }
};

// ---------------------------------------------------------------------------
// JSON emission
// ---------------------------------------------------------------------------
void jnum(std::string& s, double x) {
  char buf[40];
  if (std::isinf(x))
    snprintf(buf, sizeof buf, x > 0 ? "\"inf\"" : "\"-inf\"");
  else
    snprintf(buf, sizeof buf, "%.17g", x);
  s += buf;
}
void jstr(std::string& s, const std::string& x) {
  s += '"';
  for (char c : x) {
    if (c == '"' || c == '\\') s += '\\';
    s += c;
  }
  s += '"';
}
template <class T, class F>
void jarr(std::string& s, const std::vector<T>& v, F emit) {
  s += '[';
  for (size_t i = 0; i < v.size(); ++i) {
    if (i) s += ',';
    emit(s, v[i]);
  }
  s += ']';
}
void jmat3(std::string& s, const Mat3& R) {
  s += '[';
  for (int i = 0; i < 9; ++i) {
    if (i) s += ',';
    jnum(s, R.m[i]);
  }
  s += ']';
}
void jvec3(std::string& s, const Vec3& p) {
  s += '[';
  for (int i = 0; i < 3; ++i) {
    if (i) s += ',';
    jnum(s, p.v[i]);
  }
  s += ']';
}

std::string to_json(const FlatModel& m) {
  std::string s = "{";
  s += "\"name\":";
  jstr(s, m.robot_name);
  s += ",\"joint_types\":";
  jarr(s, m.joint_types,
       [](std::string& s, int x) { s += std::to_string(x); });
  s += ",\"parents\":";
  jarr(s, m.parents, [](std::string& s, int x) { s += std::to_string(x); });
  s += ",\"joint_names\":";
  jarr(s, m.joint_names,
       [](std::string& s, const std::string& x) { jstr(s, x); });
  s += ",\"jp_R\":";
  jarr(s, m.jp,
       [](std::string& s, const Transform& X) { jmat3(s, X.R); });
  s += ",\"jp_p\":";
  jarr(s, m.jp,
       [](std::string& s, const Transform& X) { jvec3(s, X.p); });
  s += ",\"axis\":";
  jarr(s, m.axes, [](std::string& s, const Vec3& a) { jvec3(s, a); });
  s += ",\"mass\":";
  jarr(s, m.bodies,
       [](std::string& s, const BodyInertia& b) { jnum(s, b.mass); });
  s += ",\"com\":";
  jarr(s, m.bodies,
       [](std::string& s, const BodyInertia& b) { jvec3(s, b.com); });
  s += ",\"inertia\":";
  jarr(s, m.bodies,
       [](std::string& s, const BodyInertia& b) { jmat3(s, b.I_com); });
  s += ",\"frame_names\":";
  jarr(s, m.frame_names,
       [](std::string& s, const std::string& x) { jstr(s, x); });
  s += ",\"frame_parents\":";
  jarr(s, m.frame_parents,
       [](std::string& s, int x) { s += std::to_string(x); });
  s += ",\"fp_R\":";
  jarr(s, m.fp, [](std::string& s, const Transform& X) { jmat3(s, X.R); });
  s += ",\"fp_p\":";
  jarr(s, m.fp, [](std::string& s, const Transform& X) { jvec3(s, X.p); });
  s += ",\"q_lb\":";
  jarr(s, m.q_lb, jnum);
  s += ",\"q_ub\":";
  jarr(s, m.q_ub, jnum);
  s += ",\"v_limit\":";
  jarr(s, m.v_limit, jnum);
  s += ",\"effort_limit\":";
  jarr(s, m.effort_limit, jnum);
  s += '}';
  return s;
}

}  // namespace

extern "C" {

// Parse URDF text; returns a malloc'd JSON string (caller frees with
// crocotpu_free). On error returns a JSON {"error": "..."} string.
char* crocotpu_parse_urdf(const char* urdf_text, int floating_base) {
  std::string out;
  try {
    std::string text(urdf_text);
    XmlParser parser(text);
    auto root = parser.parse();
    UrdfModelBuilder b(*root, floating_base != 0);
    out = to_json(b.take());
  } catch (const std::exception& e) {
    out = "{\"error\":";
    jstr(out, e.what());
    out += '}';
  }
  char* buf = (char*)malloc(out.size() + 1);
  memcpy(buf, out.c_str(), out.size() + 1);
  return buf;
}

void crocotpu_free(char* p) { free(p); }

}  // extern "C"
