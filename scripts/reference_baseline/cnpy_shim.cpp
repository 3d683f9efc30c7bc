// Minimal implementation of the cnpy API surface the reference engine uses
// (cnpy::npy_load for uncompressed little-endian .npy v1.0/2.0 files).
// Written from the NumPy format spec — NOT derived from the cnpy project —
// solely so the reference's search.cpp can be compiled on this machine to
// produce a measured CPU baseline.  Reference declares the API in cnpy.h
// but ships no cnpy.cpp.

#include <cnpy.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <stdexcept>
#include <string>

namespace cnpy {

NpyArray npy_load(std::string fname) {
    FILE* f = std::fopen(fname.c_str(), "rb");
    if (!f) throw std::runtime_error("npy_load: cannot open " + fname);

    unsigned char magic[8];
    if (std::fread(magic, 1, 8, f) != 8 || std::memcmp(magic, "\x93NUMPY", 6) != 0) {
        std::fclose(f);
        throw std::runtime_error("npy_load: bad magic in " + fname);
    }
    const int major = magic[6];
    uint32_t header_len = 0;
    if (major == 1) {
        unsigned char b[2];
        if (std::fread(b, 1, 2, f) != 2) throw std::runtime_error("npy_load: truncated header");
        header_len = b[0] | (b[1] << 8);
    } else {
        unsigned char b[4];
        if (std::fread(b, 1, 4, f) != 4) throw std::runtime_error("npy_load: truncated header");
        header_len = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
    }
    std::string header(header_len, '\0');
    if (std::fread(&header[0], 1, header_len, f) != header_len)
        throw std::runtime_error("npy_load: truncated header dict");

    // parse "'descr': '<f4'"
    auto dpos = header.find("'descr'");
    auto q1 = header.find('\'', dpos + 7);
    auto q2 = header.find('\'', q1 + 1);
    std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
    if (descr.size() < 3 || (descr[0] != '<' && descr[0] != '|'))
        throw std::runtime_error("npy_load: unsupported descr " + descr + " in " + fname);
    size_t word_size = std::stoul(descr.substr(2));

    bool fortran = header.find("'fortran_order': True") != std::string::npos;

    auto spos = header.find("'shape'");
    auto p1 = header.find('(', spos);
    auto p2 = header.find(')', p1);
    std::string shape_s = header.substr(p1 + 1, p2 - p1 - 1);
    std::vector<size_t> shape;
    size_t pos = 0;
    while (pos < shape_s.size()) {
        while (pos < shape_s.size() && !isdigit(shape_s[pos])) pos++;
        if (pos >= shape_s.size()) break;
        size_t end = pos;
        while (end < shape_s.size() && isdigit(shape_s[end])) end++;
        shape.push_back(std::stoul(shape_s.substr(pos, end - pos)));
        pos = end;
    }
    if (shape.empty()) shape.push_back(1);

    NpyArray arr(shape, word_size, fortran);
    if (std::fread(arr.data<char>(), 1, arr.num_bytes(), f) != arr.num_bytes()) {
        std::fclose(f);
        throw std::runtime_error("npy_load: truncated data in " + fname);
    }
    std::fclose(f);
    return arr;
}

}  // namespace cnpy
