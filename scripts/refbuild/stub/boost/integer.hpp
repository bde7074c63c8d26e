// clean-room stub: boost::uint_t/int_t least-width selectors
// (only the ::least member, as used by FMIndex/FMIndex.h:30-33)
#ifndef STUB_BOOST_INTEGER_HPP
#define STUB_BOOST_INTEGER_HPP
#include <cstdint>
namespace boost {
template <int Bits> struct uint_t {
    typedef typename std::conditional<Bits <= 8, uint8_t,
        typename std::conditional<Bits <= 16, uint16_t,
        typename std::conditional<Bits <= 32, uint32_t,
        uint64_t>::type>::type>::type least;
};
template <int Bits> struct int_t {
    typedef typename std::conditional<Bits <= 8, int8_t,
        typename std::conditional<Bits <= 16, int16_t,
        typename std::conditional<Bits <= 32, int32_t,
        int64_t>::type>::type>::type least;
};
}
#endif
