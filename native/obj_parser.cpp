// Native Wavefront OBJ tokenizer for the bifrost3d_tpu data loader.
//
// Role: the reference links tinyobjloader (C++) for OBJ parsing
// (extensions/ObjLoader); Python-side line parsing is the bottleneck for
// multi-million-triangle scenes, so the hot tokenizing/triangulating pass
// lives here behind a C ABI (ctypes binding in bifrost3d_tpu/io/native_obj.py,
// with a pure-Python fallback kept in lockstep by a parity test).
//
// Protocol: parse() reads and resolves everything into an internal handle
// and reports counts; fetch() copies into caller-allocated numpy buffers
// and free() releases the handle.

#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Corner {
    int pos, uv, normal;  // 0-based resolved; -1 = absent
};

struct ObjData {
    std::vector<float> positions;  // 3 per vertex
    std::vector<float> normals;    // 3 per vertex
    std::vector<float> uvs;        // 2 per vertex
    std::vector<int> tri_corners;  // 9 per triangle: (pos,uv,n) x3
    std::vector<int> tri_material; // 1 per triangle
    std::vector<std::string> material_names;
    std::string mtllib;
};

std::vector<ObjData*> g_handles;

inline const char* skip_ws(const char* p, const char* end) {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
    return p;
}

inline const char* next_line(const char* p, const char* end) {
    while (p < end && *p != '\n') ++p;
    return p < end ? p + 1 : end;
}

// Resolve a 1-based (possibly negative-relative) OBJ index to 0-based.
inline int resolve(long idx, size_t count) {
    if (idx > 0) return static_cast<int>(idx - 1);
    if (idx < 0) return static_cast<int>(count + idx);
    return -1;
}

int current_material(ObjData& d, const std::string& name) {
    for (size_t i = 0; i < d.material_names.size(); ++i)
        if (d.material_names[i] == name) return static_cast<int>(i);
    d.material_names.push_back(name);
    return static_cast<int>(d.material_names.size() - 1);
}

}  // namespace

extern "C" {

int bifrost_obj_parse(const char* path, int* n_positions, int* n_normals,
                      int* n_uvs, int* n_triangles, int* n_materials,
                      int* material_names_len, int* mtllib_len) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::string buf(static_cast<size_t>(size), '\0');
    if (size > 0 && std::fread(&buf[0], 1, static_cast<size_t>(size), f)
            != static_cast<size_t>(size)) {
        std::fclose(f);
        return -1;
    }
    std::fclose(f);

    ObjData* d = new ObjData();
    int cur_mat = -1;
    std::vector<Corner> corners;
    corners.reserve(8);

    const char* p = buf.data();
    const char* end = p + buf.size();
    while (p < end) {
        const char* line_end = p;
        while (line_end < end && *line_end != '\n') ++line_end;
        p = skip_ws(p, line_end);
        if (p < line_end && *p == 'v') {
            if (p + 1 < line_end && p[1] == ' ') {  // v x y z
                char* q = const_cast<char*>(p + 1);
                for (int k = 0; k < 3; ++k)
                    d->positions.push_back(std::strtof(q, &q));
            } else if (p + 2 < line_end && p[1] == 'n' && p[2] == ' ') {
                char* q = const_cast<char*>(p + 2);
                for (int k = 0; k < 3; ++k)
                    d->normals.push_back(std::strtof(q, &q));
            } else if (p + 2 < line_end && p[1] == 't' && p[2] == ' ') {
                char* q = const_cast<char*>(p + 2);
                for (int k = 0; k < 2; ++k)
                    d->uvs.push_back(std::strtof(q, &q));
            }
        } else if (p < line_end && *p == 'f' && p + 1 < line_end && p[1] == ' ') {
            corners.clear();
            const char* q = p + 1;
            while (q < line_end) {
                q = skip_ws(q, line_end);
                if (q >= line_end) break;
                char* r = const_cast<char*>(q);
                long vi = std::strtol(r, &r, 10);
                long ti = 0, ni = 0;
                if (r < line_end && *r == '/') {
                    ++r;
                    if (r < line_end && *r != '/') ti = std::strtol(r, &r, 10);
                    if (r < line_end && *r == '/') {
                        ++r;
                        ni = std::strtol(r, &r, 10);
                    }
                }
                Corner c;
                c.pos = resolve(vi, d->positions.size() / 3);
                c.uv = resolve(ti, d->uvs.size() / 2);
                c.normal = resolve(ni, d->normals.size() / 3);
                corners.push_back(c);
                q = r;
            }
            // Fan triangulation, matching the Python loader.
            for (size_t k = 1; k + 1 < corners.size(); ++k) {
                const Corner tri[3] = {corners[0], corners[k], corners[k + 1]};
                for (int c = 0; c < 3; ++c) {
                    d->tri_corners.push_back(tri[c].pos);
                    d->tri_corners.push_back(tri[c].uv);
                    d->tri_corners.push_back(tri[c].normal);
                }
                d->tri_material.push_back(cur_mat);
            }
        } else if (line_end - p > 7 && std::strncmp(p, "usemtl", 6) == 0) {
            const char* q = skip_ws(p + 6, line_end);
            cur_mat = current_material(
                *d, std::string(q, static_cast<size_t>(line_end - q
                    - (line_end > q && line_end[-1] == '\r' ? 1 : 0))));
        } else if (line_end - p > 7 && std::strncmp(p, "mtllib", 6) == 0) {
            const char* q = skip_ws(p + 6, line_end);
            d->mtllib.assign(q, static_cast<size_t>(line_end - q
                - (line_end > q && line_end[-1] == '\r' ? 1 : 0)));
        }
        p = line_end < end ? line_end + 1 : end;
    }

    // Faces before any usemtl get material -1; keep that as index of an
    // implicit unnamed material only if mixed with named ones.
    size_t names_len = 0;
    for (const std::string& s : d->material_names) names_len += s.size() + 1;

    *n_positions = static_cast<int>(d->positions.size() / 3);
    *n_normals = static_cast<int>(d->normals.size() / 3);
    *n_uvs = static_cast<int>(d->uvs.size() / 2);
    *n_triangles = static_cast<int>(d->tri_material.size());
    *n_materials = static_cast<int>(d->material_names.size());
    *material_names_len = static_cast<int>(names_len);
    *mtllib_len = static_cast<int>(d->mtllib.size());

    g_handles.push_back(d);
    return static_cast<int>(g_handles.size() - 1);
}

int bifrost_obj_fetch(int handle, float* positions, float* normals, float* uvs,
                      int* tri_corners, int* tri_material,
                      char* material_names, char* mtllib) {
    if (handle < 0 || handle >= static_cast<int>(g_handles.size())
        || !g_handles[handle])
        return -1;
    ObjData* d = g_handles[handle];
    if (!d->positions.empty())
        std::memcpy(positions, d->positions.data(),
                    d->positions.size() * sizeof(float));
    if (!d->normals.empty())
        std::memcpy(normals, d->normals.data(),
                    d->normals.size() * sizeof(float));
    if (!d->uvs.empty())
        std::memcpy(uvs, d->uvs.data(), d->uvs.size() * sizeof(float));
    if (!d->tri_corners.empty())
        std::memcpy(tri_corners, d->tri_corners.data(),
                    d->tri_corners.size() * sizeof(int));
    if (!d->tri_material.empty())
        std::memcpy(tri_material, d->tri_material.data(),
                    d->tri_material.size() * sizeof(int));
    char* out = material_names;
    for (const std::string& s : d->material_names) {
        std::memcpy(out, s.data(), s.size());
        out += s.size();
        *out++ = '\n';
    }
    if (!d->mtllib.empty())
        std::memcpy(mtllib, d->mtllib.data(), d->mtllib.size());
    return 0;
}

int bifrost_obj_free(int handle) {
    if (handle < 0 || handle >= static_cast<int>(g_handles.size())
        || !g_handles[handle])
        return -1;
    delete g_handles[handle];
    g_handles[handle] = nullptr;
    return 0;
}

}  // extern "C"
